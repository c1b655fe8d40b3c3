package graft.llm

import graft.SparkSpec

class GopherSpec extends SparkSpec {
  import spark.implicits._

  // 100 words, mean length 3.7, three Gopher stop words, no symbols
  private val good =
    Seq.fill(10)("the quick brown fox jumps over lazy dogs to be").mkString(" ")

  private lazy val docs = Seq(
    (0L, good),                                                    // clean
    (1L, "too short to pass"),                                     // n_words
    (2L, good + " ############"),                                  // symbols
    (3L, Seq.fill(20)("- item").mkString("\n") + "\n" + good),     // bullets
    (4L, good + "\n" + Seq.fill(5)("wait...").mkString("\n")),     // ellipsis
    (5L, good + " " + Seq.fill(40)("12345").mkString(" ")),        // alpha
    (6L, good + " " + Seq.fill(60)("x" * 25).mkString(" ")),       // word len
    (7L, null.asInstanceOf[String]),                               // empty
    (8L, Seq.fill(12)("zzzz yyyy xxxx wwww vvvv").mkString(" ")))  // stop words
    .toDF("doc_id", "text")

  test("each rule boolean flips on its targeted violation only") {
    val p = Gopher.profile(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(p(0).getAs[Boolean]("keep"), "clean doc must keep")
    assert(!p(1).getAs[Boolean]("ok_words") && !p(1).getAs[Boolean]("keep"))
    assert(!p(2).getAs[Boolean]("ok_symbol") && p(2).getAs[Boolean]("ok_words"))
    assert(!p(3).getAs[Boolean]("ok_bullet"))
    assert(!p(4).getAs[Boolean]("ok_ellipsis") && p(4).getAs[Boolean]("ok_symbol"))
    assert(!p(5).getAs[Boolean]("ok_alpha") && p(5).getAs[Boolean]("ok_mean_len"))
    assert(!p(6).getAs[Boolean]("ok_mean_len"))
    assert(!p(8).getAs[Boolean]("ok_stop"))
  }

  test("metric values: counts, ratios, and the published rounding") {
    val p = Gopher.profile(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(p(0).getAs[Int]("n_words") == 100)
    assert(p(0).getAs[Double]("mean_word_len") == 3.7)
    assert(p(0).getAs[Int]("n_stopwords") == 3)   // the, to, be
    assert(p(2).getAs[Double]("symbol_ratio") ==
      BigDecimal(12.0 / 101).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(p(3).getAs[Double]("bullet_frac") ==
      BigDecimal(20.0 / 21).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(p(4).getAs[Double]("ellipsis_frac") ==
      BigDecimal(5.0 / 6).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("null/empty documents profile as all-zero and fail ok_words") {
    val p = Gopher.profile(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(p(7).getAs[Int]("n_words") == 0)
    assert(p(7).getAs[Double]("mean_word_len") == 0.0)
    assert(p(7).getAs[Double]("symbol_ratio") == 0.0)
    assert(p(7).getAs[Double]("bullet_frac") == 0.0)
    assert(p(7).getAs[Int]("n_stopwords") == 0)
    assert(!p(7).getAs[Boolean]("ok_words") && !p(7).getAs[Boolean]("keep"))
  }

  test("keepDocs returns only survivors, original columns intact") {
    val kept = Gopher.keepDocs(docs, "doc_id", "text")
    assert(kept.columns.toSeq == Seq("doc_id", "text"))
    assert(kept.select("doc_id").as[Long].collect().toSet == Set(0L))
  }

  test("thresholds are parameters: loosening a band readmits its victims") {
    val loose = Gopher.profile(docs, "doc_id", "text",
        minWords = 1, minStopwords = 0)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(loose(1L).getAs[Boolean]("ok_words"))
    assert(loose(8L).getAs[Boolean]("ok_stop"))
  }
}
