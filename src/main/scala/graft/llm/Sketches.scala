package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch frequency estimation (Cormode & Muthukrishnan 2005):
  * token frequencies from a `depth × width` counter grid instead of a
  * full distinct aggregation — the sketch is `depth·width` cells
  * regardless of vocabulary size, the standard trade when the corpus is
  * 100 TB and the vocabulary won't fit (or isn't worth) a shuffle.
  * Estimates are biased HIGH (collisions only ever add), within
  * `2·Σcounts/width` at probability `1 − (1/2)^depth` — the textbook
  * bound — and exact when a probe's buckets happen collision-free.
  *
  * Scale shape: ONE pass over the tokens (each emits `depth` cells via
  * a narrow explode), one partial-agg'd groupBy over ≤ `depth·width`
  * groups; probes then look up their cells against the tiny cell table.
  * Row hashes are the repo's portable md5 construction (first 8 hex
  * digits of `md5(row ':' token)` mod width), so a DuckDB oracle
  * restates the whole sketch bit-for-bit.
  *
  * Output: `(probe, true_n, est_n)` per probe token — `true_n` (an
  * exact count, computed for verification; skip it in production) and
  * the sketch estimate, `est_n >= true_n` always.
  */
object Sketches {

  private def bucketOf(row: Column, tok: Column, width: Int): Column =
    pmod(graft.functions.Hashes.u32OfMd5(
      concat(row.cast("string"), lit(":"), tok)), lit(width.toLong))

  def cmsEstimate(docs: DataFrame, textCol: String, probes: Seq[String],
                  depth: Int = 3, width: Int = 256): DataFrame = {
    require(depth >= 1, s"depth must be >= 1, got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    require(probes.nonEmpty, "need at least one probe token")
    val spark = docs.sparkSession
    import spark.implicits._

    val toks = docs
      .select(explode(split(Dedup.normalize(col(textCol)), " ")).as("tok"))
      .filter(col("tok") =!= "")
    // one token pass: each token emits its `depth` (row, bucket) cells
    val cells = toks.select(explode(array((0 until depth).map(i =>
        struct(lit(i).as("row"),
          bucketOf(lit(i), col("tok"), width).as("bucket"))): _*)).as("c"))
      .groupBy(col("c.row").as("row"), col("c.bucket").as("bucket"))
      .agg(count(lit(1)).as("n"))

    val probeCells = probes.flatMap(p => (0 until depth).map(i => (p, i)))
      .toDF("probe", "row")
      .withColumn("bucket", bucketOf(col("row"), col("probe"), width))
    val est = probeCells.join(cells, Seq("row", "bucket"), "left")
      .groupBy("probe")
      .agg(min(coalesce(col("n"), lit(0L))).as("est_n"))

    val truth = toks.groupBy(col("tok")).agg(count(lit(1)).as("true_n"))
    est.join(truth, est("probe") === truth("tok"), "left")
      .select(col("probe"), coalesce(col("true_n"), lit(0L)).as("true_n"),
        col("est_n"))
      .orderBy("probe")
  }
}
