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
}
