package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact-count stratified split/sample: per-stratum sizes are EXACT
  * (the contract hashSplit's rate-based carve cannot give), assignment
  * is deterministic across reruns, and null ids fail loudly.
  */
class StratifiedSplitSpec extends SparkSpec {
  import spark.implicits._

  private val df = (1L to 100L).map(i =>
      (i, if (i % 3 == 0) "vi" else if (i % 3 == 1) "en" else "de"))
    .toDF("id", "lang")
  private val splits = Seq(("test", 0.1), ("val", 0.2), ("train", 0.7))

  test("every stratum contributes exactly floor(n*frac) to each split") {
    val out = Sampling.splitStratified(df, "id", Seq("lang"), splits)
    val sizes = out.groupBy("lang", "split").count()
      .as[(String, String, Long)].collect()
      .map { case (l, s, c) => (l, s) -> c }.toMap
    // strata sizes: en 34, de 33, vi 33
    assert(sizes(("en", "test")) === 3)   // floor(34*0.1)
    assert(sizes(("en", "val")) === 6)    // floor(34*0.2)
    assert(sizes(("en", "train")) === 25)
    for (l <- Seq("de", "vi")) {
      assert(sizes((l, "test")) === 3)    // floor(33*0.1)
      assert(sizes((l, "val")) === 6)     // floor(33*0.2)
      assert(sizes((l, "train")) === 24)
    }
  }

  test("assignment is deterministic and disjoint-complete") {
    val a = Sampling.splitStratified(df, "id", Seq("lang"), splits)
      .select("id", "split").as[(Long, String)].collect().toMap
    val b = Sampling.splitStratified(
        df.repartition(7), "id", Seq("lang"), splits)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(a === b)                       // partitioning-independent
    assert(a.size === 100)                // every row assigned once
  }

  test("null id fails loudly instead of landing nondeterministically") {
    val bad = Seq((Some(1L), "en"), (None, "en")).toDF("id", "lang")
    val e = intercept[Exception] {
      Sampling.splitStratified(bad, "id", Seq("lang"), splits).collect()
    }
    assert(e.getMessage.contains("splitStratified") ||
      Option(e.getCause).exists(_.getMessage.contains("splitStratified")))
  }

  test("split rank order agrees with the stratified sample's draw") {
    // the existing exact-n sample (Sampling.stratified) and the new
    // exact-count split share the same portable (md5, id) permutation:
    // the k sampled rows of a stratum are exactly the stratum's k
    // rank-smallest rows under the split's ordering
    val sampled = Sampling.stratified(df, Seq("lang"), "id", n = 3)
      .select("id").as[Long].collect().toSet
    val ranked = Sampling.splitStratified(df, "id", Seq("lang"),
        Seq(("head", 0.1), ("rest", 0.9)))
    // floor(34*0.1) = floor(33*0.1) = 3 -> 'head' = each stratum's 3
    // rank-smallest rows, which is exactly the n=3 stratified sample
    val head = ranked.filter(col("split") === "head")
      .select("id").as[Long].collect().toSet
    assert(head === sampled)
    assert(head.size === 9)
  }
}
