package graft.llm

import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    "a a a a b b c", "a b d d", "e e e c").toDF("text")

  test("estimates are never below the true count, exact when collision-free") {
    val out = Sketches.cmsEstimate(docs, "text",
        probes = Seq("a", "b", "c", "d", "e", "zzz"), depth = 3, width = 512)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val truth = Map("a" -> 5L, "b" -> 3L, "c" -> 2L, "d" -> 2L, "e" -> 3L, "zzz" -> 0L)
    out.foreach { case (p, t, e) =>
      assert(t == truth(p), s"true count for $p")
      assert(e >= t, s"CMS under-estimated $p: $e < $t")
    }
    // at width 512 over a 6-token vocabulary, collisions are essentially
    // impossible across 3 independent rows → exact
    assert(out.forall { case (_, t, e) => e == t })
  }

  test("a tiny sketch collides and over-estimates, never under") {
    val out = Sketches.cmsEstimate(docs, "text",
        probes = Seq("a", "b", "c", "d", "e", "zzz"), depth = 2, width = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.forall { case (_, t, e) => e >= t })
    // 15 tokens into 2 buckets: some probe MUST be inflated
    assert(out.exists { case (_, t, e) => e > t })
  }

  test("groupCardinality: exact below k, close above k, nulls ignored") {
    val rows = (1 to 2000).map(i => ("big", i % 700)) ++
      (1 to 50).map(i => ("small", i % 3)) :+ (("small", -1))
    val df = rows.toDF("k", "v")
      .withColumn("v", org.apache.spark.sql.functions
        .when($"v" === -1, null).otherwise($"v"))
    val out = CorpusStats.groupCardinality(df, "k", "v", k = 64)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // small: 3 distinct, null dropped → exact
    assert(out("small") == ((3L, 3.0)))
    // big: 700 distinct through a 64-digest sketch — KMV stdev is
    // ~1/sqrt(k-2) ≈ 13%, and THIS deterministic md5 draw happens to
    // sit ~3 sigma out; assert the order of magnitude, not luck
    assert(out("big")._1 == 64L)
    assert(out("big")._2 > 350.0 && out("big")._2 < 1400.0, out("big").toString)
  }

  test("distributionDrift: zero on identical, TV 1 on disjoint, symmetric") {
    val a = Seq("x y z x", "y y").toDF("text")
    val b = Seq("x y z x y y").toDF("text")   // same token distribution
    val same = CorpusStats.distributionDrift(a, b, "text").head()
    assert(same.getAs[Double]("l1") == 0.0 && same.getAs[Double]("tv") == 0.0)
    val c = Seq("p q r").toDF("text")
    val disjoint = CorpusStats.distributionDrift(a, c, "text").head()
    // each |p − q| term carries <= 5e-16 of decimal quantization
    assert(math.abs(disjoint.getAs[Double]("tv") - 1.0) < 1e-12)
    val d = Seq("x q q").toDF("text")
    val ab = CorpusStats.distributionDrift(a, d, "text").head().getAs[Double]("l1")
    val ba = CorpusStats.distributionDrift(d, a, "text").head().getAs[Double]("l1")
    assert(ab == ba && ab > 0.0 && ab < 2.0)
  }
}
