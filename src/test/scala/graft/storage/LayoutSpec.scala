package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("interleaveBits matches hand-computed Morton codes") {
    // (x=3, y=5): x bits 11 → positions 0,2; y bits 101 → positions 1,5
    // → 100111 = 39. (0,0)→0; (7,0)→0b010101=21; (0,7)→0b101010=42.
    val df = Seq((3L, 5L), (0L, 0L), (7L, 0L), (0L, 7L)).toDF("x", "y")
    val out = df.select(Layout.interleaveBits(Seq(col("x"), col("y")), 3).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(39L, 0L, 21L, 42L))
  }

  test("three-way interleave stays within bit budget and is injective on a grid") {
    val grid = for { a <- 0 to 7; b <- 0 to 7; c <- 0 to 7 } yield (a.toLong, b.toLong, c.toLong)
    val keys = grid.toDF("a", "b", "c")
      .select(Layout.interleaveBits(Seq(col("a"), col("b"), col("c")), 3).as("z"))
      .collect().map(_.getLong(0))
    assert(keys.distinct.length == 512 && keys.forall(k => k >= 0 && k < 512))
  }

  test("cellOf rank-buckets a skewed column evenly") {
    // heavily skewed: 90% of mass at small values — equal-width cells
    // would pile everything into cell 0; rank cells must spread it
    val df = (1 to 1000).map(i => math.pow(i.toDouble, 4)).toDF("v")
    val bounds = Layout.rankBoundaries(df, "v", bits = 2) // 3 cuts → 4 cells
    val counts = df.select(Layout.cellOf(col("v"), bounds).as("cell"))
      .groupBy("cell").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set(0, 1, 2, 3), counts.toString)
    assert(counts.values.forall(n => n > 150 && n < 350), counts.toString)
  }

  test("z-ordered write round-trips content and tiles both dimensions") {
    val n = 64
    val grid = (for { x <- 0 until n; y <- 0 until n } yield
      (x.toLong, y.toLong, s"p$x-$y")).toDF("x", "y", "payload")
    val path = java.nio.file.Files.createTempDirectory("zorder").toString + "/t"
    Layout.writeZOrdered(grid, path, Seq("x", "y"), bits = 6, numFiles = 16)

    val back = spark.read.parquet(path)
    assert(back.count() == n.toLong * n)
    assert(back.select("x", "y", "payload").except(grid).isEmpty &&
      grid.except(back.select("x", "y", "payload")).isEmpty)

    // locality: the TYPICAL file's bounding box must be compact in BOTH
    // dimensions (near sqrt(4096/16)=16 per side). The worst file is
    // exempt: a range cut landing on a z-curve quadrant seam spans both
    // quadrants — inherent to any linearized space-filling curve. The
    // contrast class is the lexicographic (x, y) sort, whose every file
    // is a full-height slab (dy = 63).
    def extents(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.withColumn("f", input_file_name())
        .groupBy("f")
        .agg((max("x") - min("x")).as("dx"), (max("y") - min("y")).as("dy"))
        .collect().toSeq.map(r => math.max(r.getLong(1), r.getLong(2)))
    val zExt = extents(back)
    assert(zExt.length == 16, s"expected 16 files, got ${zExt.length}")
    assert(zExt.count(_ <= 34) >= 12, s"z-order files too wide: $zExt")

    val lexPath = path + "_lex"
    grid.repartitionByRange(16, col("x"), col("y"))
      .sortWithinPartitions("x", "y")
      .write.mode("overwrite").parquet(lexPath)
    val lexExt = extents(spark.read.parquet(lexPath))
    assert(lexExt.count(_ <= 34) == 0, s"lex baseline unexpectedly tiled: $lexExt")

    // READ-SIDE payoff, measured: filter on the SECOND sort column only
    // (y ∈ [8, 15] — the case a lexicographic layout cannot prune). Each
    // 256-row file is one parquet row group, so pushed min/max filters
    // skip whole groups; the scan's numOutputRows counts rows decoded
    // from SURVIVING groups. Z-order tiles put y∈[8,15] in a handful of
    // files; every lex slab spans all y, so nothing is skipped.
    def scannedRows(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      val scans = df.queryExecution.executedPlan.collectLeaves().collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(scans.nonEmpty, df.queryExecution.executedPlan.toString.take(500))
      scans.map(_.metrics("numOutputRows").value).sum
    }
    val zRead = spark.read.parquet(path).filter(col("y").between(8, 15))
    val lexRead = spark.read.parquet(lexPath).filter(col("y").between(8, 15))
    assert(zRead.select("x", "y", "payload").except(lexRead.select("x", "y", "payload")).isEmpty &&
      lexRead.count() == n.toLong * 8, "filtered reads disagree")
    val (zRows, lexRows) = (scannedRows(zRead), scannedRows(lexRead))
    assert(lexRows == n.toLong * n,
      s"lex baseline should decode every row group, decoded $lexRows")
    assert(zRows <= lexRows / 2,
      s"z-order should skip most row groups: decoded $zRows of $lexRows")
  }
}
