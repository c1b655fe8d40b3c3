package graft.llm

import graft.SparkSpec

class SearchSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark join join join fast"),     // tf(join)=3, dl=5
    (2L, "join window"),                   // tf(join)=1, tf(window)=1, dl=2
    (3L, "sort merge only here"),          // no query terms
    (4L, "window window"),                 // tf(window)=2, dl=2
    (5L, "")).toDF("doc_id", "text")       // blank → dl=0, dropped

  // the operator's exact arithmetic, replicated step for step (same
  // IEEE ops in the same order) so scores can be asserted bitwise
  private def expected(tf: Map[String, Long], dl: Long,
                       df: Map[String, Long], n: Long, sumDl: Long,
                       terms: Seq[String],
                       k1: Double = 1.2, b: Double = 0.75): Double = {
    val nD = n.toDouble
    val avgdl = sumDl.toDouble / nD
    terms.map { t =>
      val dfD = df(t).toDouble
      val idf = (nD - dfD + 0.5) / (dfD + 0.5)
      val tfD = tf.getOrElse(t, 0L).toDouble
      idf * ((tfD * (k1 + 1.0)) / (tfD + k1 * (1.0 - b + b * (dl / avgdl))))
    }.reduceLeft(_ + _)
  }

  private val terms = Seq("join", "window", "shuffle")
  private val df = Map("join" -> 2L, "window" -> 2L, "shuffle" -> 0L)
  private val n = 5L
  private val sumDl = 13L // 5 + 2 + 4 + 2 + 0

  test("scores are the exact BM25 rational-idf values; zero-score docs dropped") {
    val out = Search.bm25TopK(corpus, "doc_id", "text", terms, k = 10)
      .select("doc_id", "dl", "score")
      .as[(Long, Long, Double)].collect().toSeq
    // doc 2 hits two terms at dl=2 → top; docs 3 and 5 dropped
    assert(out.map(_._1) == Seq(2L, 4L, 1L))
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(1L)._3 ==
      expected(Map("join" -> 3L), 5L, df, n, sumDl, terms))
    assert(byId(2L)._3 ==
      expected(Map("join" -> 1L, "window" -> 1L), 2L, df, n, sumDl, terms))
    assert(byId(4L)._3 ==
      expected(Map("window" -> 2L), 2L, df, n, sumDl, terms))
  }

  test("corpusStats counts N, total length, and per-term df") {
    val st = Search.corpusStats(corpus, "text", terms)
    assert(st.nDocs == n && st.sumDl == sumDl)
    assert(st.df == df)
    // reusing precomputed stats skips the stats job but not the answer
    val a = Search.bm25TopK(corpus, "doc_id", "text", terms, k = 2)
      .as[(Long, Long, Double)].collect().toSeq
    val b = Search.bm25TopK(corpus, "doc_id", "text", terms, k = 2,
      stats = Some(st)).as[(Long, Long, Double)].collect().toSeq
    assert(a == b && a.size == 2)
  }

  test("query normalization: case, blanks, duplicates") {
    assert(Search.normalizeQuery(Seq(" JOIN ", "", "join", "Window")) ==
      Seq("join", "window"))
  }

  test("hybridTopK: RRF fuses ranks; single-arm docs get a null rank") {
    val embs = Seq(
      (1L, Array(1.0f, 0.0f)),   // aligned with the query vector → vec rank 1
      (2L, Array(0.6f, 0.8f)),
      (3L, Array(0.0f, 1.0f)),   // orthogonal — worst nonneg cosine
      (6L, Array(0.9f, 0.1f)))   // no text counterpart: vector-only arm
    val out = Search.hybridTopK(corpus, embs.toDF("vec_id", "embedding"),
        "doc_id", "text", "vec_id", "embedding",
        terms, Seq(1.0, 0.0), k = 10, kEach = 10)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1 else r.getInt(1),
        if (r.isNullAt(2)) -1 else r.getInt(2),
        r.getDouble(3))).toSeq
    val byId = out.map(r => r._1 -> r).toMap
    // lexical arm ranks (from the bm25 test): 2, 4, 1; vector arm ranks:
    // 1 -> 1, 6 -> 2, 2 -> 3, 3 -> 4
    assert(byId(1L) == ((1L, 3, 1, 1.0 / 63 + 1.0 / 61)))
    assert(byId(2L) == ((2L, 1, 3, 1.0 / 61 + 1.0 / 63)))
    assert(byId(4L) == ((4L, 2, -1, 1.0 / 62 + 0.0)))   // lexical only
    assert(byId(6L) == ((6L, -1, 2, 0.0 + 1.0 / 62)))   // vector only
    assert(byId(3L) == ((3L, -1, 4, 0.0 + 1.0 / 64)))   // zero-score text dropped
    // fused order: ties impossible here; ranks 1+1 beats everything
    assert(out.map(_._1).take(2).toSet == Set(1L, 2L))
  }

  test("plan: scoring is narrow — TakeOrdered with no exchange") {
    // k must stay BELOW the post-filter row count: on a LocalRelation the
    // optimizer pre-evaluates the filter (3 scored docs survive) and
    // EliminateLimits drops a limit >= maxRows, leaving a global sort
    val st = Search.corpusStats(corpus, "text", terms)
    val plan = Search.bm25TopK(corpus, "doc_id", "text", terms, k = 2,
        stats = Some(st))
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    assert(!plan.contains("Exchange"))
  }
}
