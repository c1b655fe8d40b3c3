package graft.llm

import graft.SparkSpec

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private lazy val target = Seq(
    (0L, "alpha beta gamma delta alpha beta"),
    (1L, "beta gamma delta epsilon alpha beta")).toDF("doc_id", "text")

  private lazy val raw = Seq(
    (10L, "alpha beta gamma delta epsilon alpha beta gamma"), // target-like
    (11L, "zebra yak xylophone walrus vulture zebra yak"),    // off-target
    (12L, "alpha beta zebra yak gamma delta"),                // mixed
    (13L, "solo"),                                            // too short
    (14L, "")).toDF("doc_id", "text")                         // empty

  test("weights rank target-like above mixed above off-target") {
    val w = Dsir.importanceWeights(raw, target, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        Option(r.getAs[java.lang.Double]("dsir_weight")).map(_.doubleValue)).toMap
    assert(w(10L).get > w(12L).get, s"target-like ${w(10L)} <= mixed ${w(12L)}")
    assert(w(12L).get > w(11L).get, s"mixed ${w(12L)} <= off-target ${w(11L)}")
    assert(w(10L).get > 1.0, "pure target-like doc should be up-weighted")
  }

  test("sub-bigram documents get n_feats 0 and a null weight") {
    val out = Dsir.importanceWeights(raw, target, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.size == 5, "every raw doc gets a row")
    for (id <- Seq(13L, 14L)) {
      assert(out(id).getAs[Long]("n_feats") == 0L)
      assert(out(id).isNullAt(out(id).fieldIndex("dsir_weight")))
    }
    assert(out(10L).getAs[Long]("n_feats") == 7L) // 8 words -> 7 bigrams
  }

  test("weights are deterministic across runs") {
    def run() = Dsir.importanceWeights(raw, target, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(run() == run())
  }

  test("resampleTop draws the deterministic top-n, nulls excluded") {
    val w = Dsir.importanceWeights(raw, target, "doc_id", "text")
    val top = Dsir.resampleTop(w, "doc_id", n = 2)
      .select("doc_id").as[Long].collect().toSeq
    assert(top == Seq(10L, 12L))
    val all = Dsir.resampleTop(w, "doc_id", n = 10)
      .select("doc_id").as[Long].collect().toSeq
    assert(all.length == 3 && !all.contains(13L) && !all.contains(14L))
  }

  test("importanceWeightsFlagged ≡ importanceWeights(raw, raw.filter(flag))") {
    import org.apache.spark.sql.functions.{col, lit}
    // mark a subset of raw as the target (the gates' lang='en' shape),
    // incl. a null-flag doc (generic filter drops nulls; flagged must too)
    val flagged = Seq(
      (10L, "alpha beta gamma delta epsilon alpha beta gamma", Some(true)),
      (11L, "zebra yak xylophone walrus vulture zebra yak", Some(false)),
      (12L, "alpha beta zebra yak gamma delta", Some(true)),
      (13L, "solo", Some(false)),
      (14L, "", None),
      (15L, "alpha beta gamma", Some(false)))
      .toDF("doc_id", "text", "is_en")
    val generic = Dsir.importanceWeights(flagged,
        flagged.filter(col("is_en") === lit(true)), "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val viaFlag = Dsir.importanceWeightsFlagged(flagged,
        col("is_en") === lit(true), "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(generic == viaFlag)
  }

  test("hashedBigramCounts is a reusable persisted-model form") {
    val m = Dsir.hashedBigramCounts(target, "text")
    // 2 docs x 6 words -> 5 bigrams each: total token mass 10
    val mass = m.agg(org.apache.spark.sql.functions.sum("c"))
      .head().getLong(0)
    assert(mass == 10L)
  }
}
