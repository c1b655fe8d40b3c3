package graft.gates

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.analytics.EvalMetrics
import graft.llm.{Classify, Dsir, Gopher}

/** Correctness gates for the model-side curation operators — the
  * Gopher rule battery, the nearest-centroid classifiers, and DSIR
  * importance weighting — over `documents.parquet` /
  * `embeddings.parquet`. Same contract as [[LlmGates]]: every gate
  * carries a full DuckDB oracle restating the ENTIRE computation under
  * the FP parity rules in LlmGates' header (sequential folds, round-6
  * renders, VARCHAR-routed decimal boundaries).
  *
  * The Gopher gate PLANTS rule violations deterministically (doc_id
  * % 5 picks the flavor) on BOTH sides — the synthetic corpus is too
  * clean to populate the symbol/bullet/ellipsis/alpha/mean-length
  * rules naturally, and a rule whose boolean never flips is a vacuous
  * check (the piiRedact planting precedent).
  */
object CurationGates {

  private val NormWs =
    "string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ')"

  /** DuckDB restatement of [[graft.functions.Hashes.u32OfMd5]]. */
  private def u32Sql(src: String): String =
    s"list_reduce([strpos('0123456789abcdef', substr(md5($src), j, 1)) - 1 " +
      s"for j in range(1, 9)], (a, b) -> a * 16 + b)"

  // ---- Gopher rule battery --------------------------------------------

  // planted violations, one flavor per doc_id % 5 class; the literals
  // are interpolated into BOTH engines so the texts match byte-for-byte
  private val HashPlant = " ############"                    // symbol_ratio
  private val BulletPlant = "- item\n" * 20                  // bullet_frac
  private val EllipsisPlant = "\n" + "and so on...\n" * 5    // ellipsis_frac
  private val NumericPlant = " " + "12345 " * 30             // alpha_frac
  private val LongWord = "x" * 25
  private val LongWordPlant = " " + (LongWord + " ") * 40    // mean_word_len

  /** [[Gopher.profile]] over the planted corpus at the paper's
    * thresholds (minStopwords lowered to 1: the synthetic docs carry at
    * most one of the 8 Gopher stop words, so the paper's 2 would leave
    * the pass side empty). doc_id % 6 picks the plant; class 5 stays
    * UNPLANTED so the composite `keep` verdict is populated on both
    * sides (every planted class fails its rule by construction). Every
    * rule boolean flips both ways across the corpus; the oracle
    * recomputes all seven metrics and verdicts.
    */
  def gopherRules(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val aug = Tables(s, dir, "documents").select(id,
      when(id % 6 === 0, concat(col("text"), lit(HashPlant)))
        .when(id % 6 === 1, concat(lit(BulletPlant), col("text")))
        .when(id % 6 === 2, concat(col("text"), lit(EllipsisPlant)))
        .when(id % 6 === 3, concat(col("text"), lit(NumericPlant)))
        .when(id % 6 === 4, concat(col("text"), lit(LongWordPlant)))
        .otherwise(col("text")).as("text"))
    Gopher.profile(aug, "doc_id", "text", minStopwords = 1)
      .orderBy("doc_id")
  }

  /** The full Gopher profile + verdict CTE chain over `src`, ending in
    * `gverd(doc_id, metrics…, ok_*…, keep)` — shared by `gopher_rules`
    * (planted corpus) and `curation_select` (natural corpus).
    */
  private def gopherCtes(src: String, minStopwords: Int): String = {
    val stop = Gopher.stopwords.map(w => s"'$w'").mkString("[", ",", "]")
    s"""gbase AS (
       |  SELECT doc_id, text,
       |    (text IS NULL OR trim(text) = '') AS empty,
       |    $NormWs AS ws,
       |    [trim(l) for l in string_split(text, chr(10)) if trim(l) <> ''] AS ls
       |  FROM $src),
       |gmet AS (
       |  SELECT *, CAST(CASE WHEN empty THEN 0 ELSE len(ws) END AS INT) AS n_words,
       |    CAST(CASE WHEN empty THEN 0 ELSE len(ls) END AS INT) AS n_lines
       |  FROM gbase),
       |gprof AS (
       |  SELECT doc_id, n_words,
       |    CASE WHEN n_words = 0 THEN 0.0 ELSE round(
       |      CAST(list_reduce([length(w) for w in ws], (a, b) -> a + b) AS DOUBLE)
       |        / CAST(n_words AS DOUBLE), 6) END AS mean_word_len,
       |    CASE WHEN n_words = 0 THEN 0.0 ELSE round(
       |      CAST((length(text) - length(replace(text, '#', '')))
       |        + ((length(text) - length(replace(text, '...', ''))) // 3) AS DOUBLE)
       |        / CAST(n_words AS DOUBLE), 6) END AS symbol_ratio,
       |    CASE WHEN n_lines = 0 THEN 0.0 ELSE round(
       |      CAST(len([l for l in ls if starts_with(l, '- ')
       |        OR starts_with(l, '* ') OR starts_with(l, '•')]) AS DOUBLE)
       |        / CAST(n_lines AS DOUBLE), 6) END AS bullet_frac,
       |    CASE WHEN n_lines = 0 THEN 0.0 ELSE round(
       |      CAST(len([l for l in ls if ends_with(l, '...')]) AS DOUBLE)
       |        / CAST(n_lines AS DOUBLE), 6) END AS ellipsis_frac,
       |    CASE WHEN n_words = 0 THEN 0.0 ELSE round(
       |      CAST(len([w for w in ws if regexp_matches(w, '[a-z]')]) AS DOUBLE)
       |        / CAST(n_words AS DOUBLE), 6) END AS alpha_frac,
       |    CAST(CASE WHEN empty THEN 0
       |      ELSE len([s for s in $stop if list_contains(ws, s)])
       |      END AS INT) AS n_stopwords
       |  FROM gmet),
       |gverd AS (
       |  SELECT *,
       |    (n_words BETWEEN 50 AND 100000) AS ok_words,
       |    (mean_word_len BETWEEN 3.0 AND 10.0) AS ok_mean_len,
       |    (symbol_ratio <= 0.1) AS ok_symbol,
       |    (bullet_frac <= 0.9) AS ok_bullet,
       |    (ellipsis_frac <= 0.3) AS ok_ellipsis,
       |    (alpha_frac >= 0.8) AS ok_alpha,
       |    (n_stopwords >= $minStopwords) AS ok_stop,
       |    ((n_words BETWEEN 50 AND 100000)
       |      AND (mean_word_len BETWEEN 3.0 AND 10.0)
       |      AND symbol_ratio <= 0.1 AND bullet_frac <= 0.9
       |      AND ellipsis_frac <= 0.3 AND alpha_frac >= 0.8
       |      AND n_stopwords >= $minStopwords) AS keep
       |  FROM gprof)""".stripMargin
  }

  val gopherRulesSql: String =
    s"""WITH aug AS (
       |  SELECT doc_id, CASE
       |    WHEN doc_id % 6 = 0 THEN text || ' ############'
       |    WHEN doc_id % 6 = 1 THEN repeat('- item' || chr(10), 20) || text
       |    WHEN doc_id % 6 = 2 THEN text || chr(10) || repeat('and so on...' || chr(10), 5)
       |    WHEN doc_id % 6 = 3 THEN text || ' ' || repeat('12345 ', 30)
       |    WHEN doc_id % 6 = 4 THEN text || ' ' || repeat('$LongWord ', 40)
       |    ELSE text END AS text
       |  FROM documents),
       |${gopherCtes("aug", 1)}
       |SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_frac,
       |  ellipsis_frac, alpha_frac, n_stopwords,
       |  ok_words, ok_mean_len, ok_symbol, ok_bullet, ok_ellipsis,
       |  ok_alpha, ok_stop, keep
       |FROM gverd ORDER BY doc_id""".stripMargin

  // ---- embedding statistics -------------------------------------------

  /** [[graft.llm.EmbedStats.gramExact]] over the embeddings corpus:
    * the exact second-moment/covariance upper triangle — the whitening
    * input, cell-for-cell bitwise against a DuckDB restatement (decimal
    * product sums, the portable mean rounding, three exactly-rounded
    * covariance ops).
    */
  def embedGram(s: SparkSession, dir: String): DataFrame =
    graft.llm.EmbedStats.gramExact(Tables(s, dir, "embeddings"),
        "vec_id", "embedding")
      .orderBy("j", "k")

  val embedGramSql: String = {
    val dim = LlmGates.Dim
    s"""WITH ex AS (
       |  SELECT vec_id, j, CAST(embedding[j + 1] AS DOUBLE) AS v
       |  FROM embeddings, (SELECT unnest(range(0, $dim)) AS j)),
       |pr AS (
       |  SELECT a.j AS j, b.j AS k, CAST(count(*) AS BIGINT) AS n,
       |    -- VARCHAR-routed decimal boundaries: see lmBackoffSql's note
       |    sum(CAST(CAST(a.v * b.v AS VARCHAR) AS DECIMAL(28,15))) AS s
       |  FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.j <= b.j
       |  GROUP BY 1, 2),
       |m2 AS (
       |  SELECT j, k, n,
       |    CAST(CAST(s AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) AS m2
       |  FROM pr),
       |mn AS (
       |  SELECT j, floor(CAST(sum(CAST(v AS DECIMAL(20,10))) AS DOUBLE)
       |      / count(*) * 1000000 + 0.5) / 1000000 AS m
       |  FROM ex GROUP BY 1)
       |SELECT t.j, t.k, t.n, t.m2, t.m2 - a.m * b.m AS cov
       |FROM m2 t JOIN mn a ON a.j = t.j JOIN mn b ON b.j = t.k
       |ORDER BY t.j, t.k""".stripMargin
  }

  /** [[graft.llm.EmbedStats.embeddingDrift]] between the even and odd
    * halves of the embeddings corpus: L2 + cosine between the exact
    * mean vectors — the embedding-space analogue of `corpus_drift`.
    */
  def embedDrift(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
    graft.llm.EmbedStats.embeddingDrift(
      e.filter(col("vec_id") % 2 === 0), e.filter(col("vec_id") % 2 === 1),
      "embedding")
  }

  val embedDriftSql: String = {
    val dim = LlmGates.Dim
    def meanCte(name: String, par: Int) =
      s"""$name AS (
         |  SELECT j, floor(CAST(sum(CAST(CAST(embedding[j + 1] AS DOUBLE)
         |      AS DECIMAL(20,10))) AS DOUBLE) / count(*) * 1000000 + 0.5)
         |    / 1000000 AS m
         |  FROM embeddings, (SELECT unnest(range(0, $dim)) AS j)
         |  WHERE vec_id % 2 = $par GROUP BY 1)""".stripMargin
    val dotAB =
      s"list_reduce([va.v[j] * vb.v[j] for j in range(1, ${dim + 1})], (x, y) -> x + y)"
    def nrm(side: String) =
      s"sqrt(list_reduce([$side.v[j] * $side.v[j] for j in range(1, ${dim + 1})], (x, y) -> x + y))"
    s"""WITH ${meanCte("ma", 0)},
       |${meanCte("mb", 1)},
       |va AS (SELECT list(m ORDER BY j) AS v FROM ma),
       |vb AS (SELECT list(m ORDER BY j) AS v FROM mb)
       |SELECT
       |  (SELECT CAST(count(*) AS BIGINT) FROM embeddings WHERE vec_id % 2 = 0) AS n_a,
       |  (SELECT CAST(count(*) AS BIGINT) FROM embeddings WHERE vec_id % 2 = 1) AS n_b,
       |  round(sqrt(list_reduce(
       |    [(va.v[j] - vb.v[j]) * (va.v[j] - vb.v[j])
       |     for j in range(1, ${dim + 1})], (x, y) -> x + y)), 6) AS l2,
       |  CASE WHEN ${nrm("va")} * ${nrm("vb")} = 0
       |    THEN CAST('-infinity' AS DOUBLE)
       |    ELSE round($dotAB / (${nrm("va")} * ${nrm("vb")}), 6) END AS cosine
       |FROM va, vb""".stripMargin
  }

  /** [[graft.llm.EmbedStats.standardize]] over the embeddings corpus:
    * per-dimension z-scores rendered as the sorted sparse string (the
    * portable vector form).
    */
  def embedStandardize(s: SparkSession, dir: String): DataFrame =
    graft.llm.EmbedStats.standardize(Tables(s, dir, "embeddings"),
        "vec_id", "embedding")
      .orderBy("vec_id")

  val embedStandardizeSql: String = {
    val dim = LlmGates.Dim
    s"""WITH ex AS (
       |  SELECT vec_id, j, CAST(embedding[j + 1] AS DOUBLE) AS v
       |  FROM embeddings, (SELECT unnest(range(0, $dim)) AS j)),
       |st AS (
       |  SELECT j,
       |    floor(CAST(sum(CAST(v AS DECIMAL(20,10))) AS DOUBLE)
       |      / count(*) * 1000000 + 0.5) / 1000000 AS m,
       |    -- VARCHAR-routed decimal boundaries: see lmBackoffSql's note
       |    CAST(CAST(sum(CAST(CAST(v * v AS VARCHAR) AS DECIMAL(28,15)))
       |      AS VARCHAR) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS m2
       |  FROM ex GROUP BY 1),
       |sd AS (
       |  SELECT j, m, sqrt(greatest(m2 - m * m, 0.0)) AS sd FROM st),
       |z AS (
       |  SELECT e.vec_id, e.j,
       |    CASE WHEN s.sd = 0.0 OR round((e.v - s.m) / s.sd, 6) = 0.0 THEN 0.0
       |      ELSE round((e.v - s.m) / s.sd, 6) END AS zv
       |  FROM ex e JOIN sd s USING (j))
       |SELECT vec_id,
       |  STRING_AGG(CAST(j AS VARCHAR) || ':'
       |      || CAST(CAST(CAST(zv AS VARCHAR) AS DECIMAL(18,6)) AS VARCHAR),
       |    ' ' ORDER BY j) AS z_features
       |FROM z GROUP BY vec_id ORDER BY vec_id""".stripMargin
  }

  // ---- C4 filter battery ----------------------------------------------

  /** [[graft.llm.C4.profile]] over a planted corpus: doc_id % 6 picks
    * the violation flavor (one-sentence page, javascript line, lorem
    * ipsum, curly brace, bad word) with class 0 planted CLEAN (three
    * sentences) — the synthetic corpus has no punctuation at all, so
    * without planting every line fails terminal-punct retention and
    * every band is vacuous.
    */
  def c4Filters(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val aug = Tables(s, dir, "documents").select(id,
      when(id % 6 === 0,
          concat(col("text"), lit(". More text here. And a third sentence.")))
        .when(id % 6 === 1, concat(col("text"), lit(".")))
        .when(id % 6 === 2, concat(col("text"),
          lit(".\nPlease enable javascript to continue. Ok. Fine.")))
        .when(id % 6 === 3, concat(col("text"),
          lit(". Two more. Three more. lorem ipsum dolor sit.")))
        .when(id % 6 === 4, concat(col("text"),
          lit(". Two more. Three more. With a { brace.")))
        .otherwise(concat(col("text"),
          lit(". Two more. Three more. Contains badword now."))).as("text"))
    graft.llm.C4.profile(aug, "doc_id", "text").orderBy("doc_id")
  }

  val c4FiltersSql: String =
    s"""WITH aug AS (
       |  SELECT doc_id, CASE
       |    WHEN doc_id % 6 = 0 THEN text || '. More text here. And a third sentence.'
       |    WHEN doc_id % 6 = 1 THEN text || '.'
       |    WHEN doc_id % 6 = 2 THEN text || '.' || chr(10) || 'Please enable javascript to continue. Ok. Fine.'
       |    WHEN doc_id % 6 = 3 THEN text || '. Two more. Three more. lorem ipsum dolor sit.'
       |    WHEN doc_id % 6 = 4 THEN text || '. Two more. Three more. With a { brace.'
       |    ELSE text || '. Two more. Three more. Contains badword now.'
       |    END AS text
       |  FROM documents),
       |base AS (
       |  SELECT doc_id, text, (text IS NULL OR trim(text) = '') AS empty,
       |    [trim(l) for l in string_split(text, chr(10)) if trim(l) <> ''] AS ls
       |  FROM aug),
       |kp AS (
       |  SELECT *, [l for l in ls
       |    if (ends_with(l, '.') OR ends_with(l, '!') OR ends_with(l, '?'))
       |      AND NOT regexp_matches(lower(l), '\\b(javascript)\\b')] AS kept
       |  FROM base),
       |prof AS (
       |  SELECT doc_id,
       |    CASE WHEN empty THEN ''
       |      ELSE coalesce(array_to_string(kept, chr(10)), '') END AS text_clean,
       |    CAST(CASE WHEN empty THEN 0 ELSE len(kept) END AS INT) AS n_lines_kept,
       |    CAST(CASE WHEN empty THEN 0 ELSE len(ls) - len(kept) END AS INT) AS n_lines_dropped,
       |    CASE WHEN empty THEN false
       |      ELSE len([l for l in ls
       |        if regexp_matches(lower(l), '\\b(javascript)\\b')]) > 0
       |      END AS has_javascript,
       |    CASE WHEN empty THEN false
       |      ELSE contains(lower(text), 'lorem ipsum') END AS has_lorem,
       |    CASE WHEN empty THEN false
       |      ELSE contains(text, '{') END AS has_brace,
       |    CASE WHEN empty THEN false
       |      ELSE regexp_matches(lower(text), '\\b(badword|obscenity)\\b')
       |      END AS has_bad_word
       |  FROM kp),
       |sen AS (
       |  SELECT *, CAST(length(text_clean)
       |    - length(regexp_replace(text_clean, '[.!?]', '', 'g')) AS INT) AS n_sentences
       |  FROM prof)
       |SELECT doc_id, text_clean, n_lines_kept, n_lines_dropped, n_sentences,
       |  has_javascript, has_lorem, has_brace, has_bad_word,
       |  (n_sentences >= 3 AND NOT has_lorem AND NOT has_brace
       |    AND NOT has_bad_word) AS keep
       |FROM sen ORDER BY doc_id""".stripMargin

  // ---- span corruption ------------------------------------------------

  /** [[graft.llm.SpanCorrupt.spanCorrupt]] at spanLen = 3,
    * corruptEvery = 4: the full input/target example-prep transform,
    * sentinel numbering included, restated relationally (block unnest +
    * per-doc ordered string_agg).
    */
  def spanCorruptGate(s: SparkSession, dir: String): DataFrame =
    graft.llm.SpanCorrupt.spanCorrupt(Tables(s, dir, "documents"),
        "doc_id", "text", spanLen = 3, corruptEvery = 4)
      .orderBy("doc_id")

  val spanCorruptSql: String =
    s"""WITH nw AS (
       |  SELECT doc_id, $NormWs AS ws,
       |    (text IS NULL OR trim(text) = '') AS empty
       |  FROM documents),
       |base AS (
       |  SELECT doc_id, ws, empty,
       |    CAST(CASE WHEN empty THEN 0 ELSE len(ws) END AS INT) AS nt
       |  FROM nw),
       |bl AS (
       |  SELECT doc_id, CAST(b AS INT) AS b,
       |    (${u32Sql("CAST(doc_id AS VARCHAR) || ':' || CAST(b AS VARCHAR)")}
       |      % 4 = 0) AS corrupt,
       |    array_to_string(ws[b*3+1 : b*3+3], ' ') AS span
       |  FROM base, UNNEST(range(0, (nt + 2) // 3)) AS u(b)),
       |rk AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id, corrupt
       |    ORDER BY b) - 1 AS k
       |  FROM bl),
       |inp AS (
       |  SELECT doc_id, string_agg(CASE WHEN corrupt
       |      THEN '<extra_id_' || CAST(k AS VARCHAR) || '>'
       |      ELSE span END, ' ' ORDER BY b) AS input_text
       |  FROM rk GROUP BY doc_id),
       |tg AS (
       |  SELECT doc_id, CAST(count(*) AS INT) AS m,
       |    string_agg('<extra_id_' || CAST(k AS VARCHAR) || '> ' || span,
       |      ' ' ORDER BY b) AS spans
       |  FROM rk WHERE corrupt GROUP BY doc_id)
       |SELECT b2.doc_id, b2.nt AS n_tokens,
       |  CAST(coalesce(t.m, 0) AS INT) AS n_corrupt_spans,
       |  CASE WHEN b2.empty THEN '' ELSE coalesce(i.input_text, '') END AS input_text,
       |  CASE WHEN b2.empty OR t.m IS NULL THEN '<extra_id_0>'
       |    ELSE t.spans || ' <extra_id_' || CAST(t.m AS VARCHAR) || '>'
       |    END AS target_text
       |FROM base b2
       |LEFT JOIN inp i USING (doc_id) LEFT JOIN tg t USING (doc_id)
       |ORDER BY b2.doc_id""".stripMargin

  // ---- dense nearest-centroid classifier ------------------------------

  /** [[Classify.centroidTrain]] on the labeled `embeddings` table +
    * [[Classify.centroidPredict]] back over all vectors — the full
    * train→serve chain in ONE oracle (the `ann_ivf_trained` pattern):
    * exact decimal per-dimension means with the portable 6-dp rounding,
    * then round-6 cosine argmax with (cosine desc, label asc) ties.
    */
  def classifyCentroid(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
    val model = Classify.centroidTrain(e, "label", "embedding")
    Classify.centroidPredict(e, "vec_id", "embedding", model)
      .orderBy("vec_id")
  }

  /** Dense-centroid train + score CTE chain shared by the classifier
    * and evaluation gates — ends in `scored(vec_id, label, cosine)`
    * (every vector × every class, round-6) and its argmax window
    * `r(vec_id, label, cosine, rn)`.
    */
  private val centroidCtes: String = {
    val dim = LlmGates.Dim
    s"""m0 AS (
       |  SELECT label, j, count(*) AS c,
       |    floor(CAST(sum(CAST(CAST(embedding[j] AS DOUBLE) AS DECIMAL(20,10))) AS DOUBLE)
       |      / count(*) * 1000000 + 0.5) / 1000000 AS m
       |  FROM embeddings, (SELECT unnest(range(1, ${dim + 1})) AS j)
       |  GROUP BY label, j),
       |ct AS (SELECT label, list(m ORDER BY j) AS ce FROM m0 GROUP BY label),
       |scored AS (
       |  SELECT e.vec_id, ct.label,
       |    CASE WHEN ${LlmGates.normSql("e.embedding")} * ${LlmGates.normCSql("ct.ce")} = 0
       |      THEN CAST('-infinity' AS DOUBLE)
       |      ELSE round(${LlmGates.dotECSql("e.embedding", "ct.ce")}
       |        / (${LlmGates.normSql("e.embedding")} * ${LlmGates.normCSql("ct.ce")}), 6)
       |    END AS cosine
       |  FROM embeddings e, ct),
       |r AS (
       |  SELECT vec_id, label, cosine, ROW_NUMBER() OVER (PARTITION BY vec_id
       |    ORDER BY cosine DESC, label ASC) AS rn
       |  FROM scored)""".stripMargin
  }

  val classifyCentroidSql: String =
    s"""WITH $centroidCtes
       |SELECT vec_id, label AS pred_label, cosine FROM r WHERE rn = 1
       |ORDER BY vec_id""".stripMargin

  // ---- classifier evaluation ------------------------------------------

  /** Truth-joined predictions of the dense classifier — the scored
    * table the evaluation gates share.
    */
  private def centroidJoined(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
    val model = Classify.centroidTrain(e, "label", "embedding")
    Classify.centroidPredict(e, "vec_id", "embedding", model)
      .join(e.select(col("vec_id"), col("label").as("truth")), Seq("vec_id"))
  }

  /** Prediction-join CTEs over the centroid chain, ending in
    * `j(truth, pred_label)`.
    */
  private val joinedCtes: String =
    s"""$centroidCtes,
       |preds AS (SELECT vec_id, label AS pred_label FROM r WHERE rn = 1),
       |j AS (
       |  SELECT e.label AS truth, p.pred_label
       |  FROM embeddings e JOIN preds p USING (vec_id))""".stripMargin

  /** [[EvalMetrics.confusionMatrix]] of the dense classifier against
    * the true labels — integer counts only.
    */
  def classifyConfusion(s: SparkSession, dir: String): DataFrame =
    EvalMetrics.confusionMatrix(centroidJoined(s, dir), "truth", "pred_label")
      .orderBy("truth", "pred")

  val classifyConfusionSql: String =
    s"""WITH $joinedCtes
       |SELECT truth, pred_label AS pred, CAST(count(*) AS BIGINT) AS n
       |FROM j GROUP BY 1, 2 ORDER BY truth, pred""".stripMargin

  /** [[EvalMetrics.classReport]]: one-vs-rest precision/recall/F1 per
    * class — each ratio one division of exact longs (F1 via the
    * `2·tp / (n_true + n_pred)` identity), so the doubles match
    * bitwise.
    */
  def classifyReport(s: SparkSession, dir: String): DataFrame =
    EvalMetrics.classReport(centroidJoined(s, dir), "truth", "pred_label")
      .orderBy("label")

  val classifyReportSql: String =
    s"""WITH $joinedCtes,
       |t AS (SELECT truth AS label, CAST(count(*) AS BIGINT) AS n_true
       |      FROM j GROUP BY 1),
       |pr AS (SELECT pred_label AS label, CAST(count(*) AS BIGINT) AS n_pred
       |       FROM j GROUP BY 1),
       |tpx AS (SELECT truth AS label, CAST(count(*) AS BIGINT) AS tp
       |        FROM j WHERE truth = pred_label GROUP BY 1),
       |rep AS (
       |  SELECT label, coalesce(n_true, 0) AS n_true,
       |    coalesce(n_pred, 0) AS n_pred, coalesce(tp, 0) AS tp
       |  FROM t FULL JOIN pr USING (label) LEFT JOIN tpx USING (label))
       |SELECT label, n_true, n_pred, tp,
       |  CASE WHEN n_pred = 0 THEN NULL
       |    ELSE CAST(tp AS DOUBLE) / CAST(n_pred AS DOUBLE) END AS "precision",
       |  CASE WHEN n_true = 0 THEN NULL
       |    ELSE CAST(tp AS DOUBLE) / CAST(n_true AS DOUBLE) END AS recall,
       |  CAST(2 * tp AS DOUBLE) / CAST(n_true + n_pred AS DOUBLE) AS f1
       |FROM rep ORDER BY label""".stripMargin

  /** [[EvalMetrics.aucBinary]] over the class-0 one-vs-rest scores of
    * the dense classifier: does the class-0 centroid's cosine rank
    * class-0 vectors above the rest? The oracle restates the full
    * tie-averaged rank statistic over distinct scores; contributions
    * are half-integers, so the cross-engine sum is exact in any order.
    */
  def evalAuc(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
    val model = Classify.centroidTrain(e, "label", "embedding")
      .filter(col("label") === 0)
    val scored = Classify.centroidScores(e, "vec_id", "embedding", model)
      .join(e.select(col("vec_id"), (col("label") === 0).as("pos")),
        Seq("vec_id"))
    EvalMetrics.aucBinary(scored, "cosine", "pos")
  }

  val evalAucSql: String =
    s"""WITH $centroidCtes,
       |sc AS (
       |  SELECT s.cosine, (e.label = 0) AS pos
       |  FROM scored s JOIN embeddings e USING (vec_id)
       |  WHERE s.label = 0),
       |g AS (
       |  SELECT cosine AS s,
       |    CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS p,
       |    CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS n
       |  FROM sc GROUP BY 1),
       |cum AS (
       |  SELECT p, n, CAST(coalesce(sum(n) OVER (ORDER BY s ASC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cumn
       |  FROM g)
       |SELECT CAST(sum(p) AS BIGINT) AS n_pos, CAST(sum(n) AS BIGINT) AS n_neg,
       |  sum(CAST(p AS DOUBLE) * (CAST(cumn AS DOUBLE) + CAST(n AS DOUBLE) / 2.0))
       |    / (CAST(sum(p) AS DOUBLE) * CAST(sum(n) AS DOUBLE)) AS auc
       |FROM cum""".stripMargin

  // ---- sparse text classifier -----------------------------------------

  private val TextDim = 1024

  /** [[Classify.textCentroidTrain]]/[[Classify.textCentroidPredict]]
    * over `documents` with `lang` as the class: the hashed
    * bag-of-words Rocchio chain — md5 feature buckets, mean-tf
    * centroids, inverted-index dot products with decimal(28,15) exact
    * sums (VARCHAR-routed at every decimal boundary), round-6 cosine
    * argmax.
    */
  def classifyText(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents")
    val model = Classify.textCentroidTrain(d, "doc_id", "text", "lang",
      dim = TextDim)
    Classify.textCentroidPredict(d, "doc_id", "text", model, dim = TextDim)
      .orderBy("doc_id")
  }

  val classifyTextSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest($NormWs) AS t FROM documents),
       |tk AS (SELECT doc_id, t FROM tok WHERE t <> ''),
       |tf AS (
       |  SELECT doc_id, ${u32Sql("t")} % $TextDim AS i,
       |    CAST(count(*) AS BIGINT) AS tf
       |  FROM tk GROUP BY 1, 2),
       |pc AS (SELECT lang AS label, CAST(count(*) AS BIGINT) AS n
       |       FROM documents GROUP BY 1),
       |cs AS (
       |  SELECT d.lang AS label, f.i, CAST(sum(f.tf) AS BIGINT) AS s
       |  FROM tf f JOIN documents d USING (doc_id) GROUP BY 1, 2),
       |model AS (
       |  SELECT label, i, CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS m
       |  FROM cs JOIN pc USING (label)),
       |-- VARCHAR-routed decimal boundaries: see lmBackoffSql's note
       |cn AS (
       |  SELECT label, sqrt(CAST(CAST(sum(CAST(CAST(m * m AS VARCHAR)
       |    AS DECIMAL(28,15))) AS VARCHAR) AS DOUBLE)) AS cnv
       |  FROM model GROUP BY 1),
       |dn AS (
       |  SELECT doc_id, sqrt(CAST(sum(tf * tf) AS DOUBLE)) AS dnv
       |  FROM tf GROUP BY 1),
       |dots AS (
       |  SELECT f.doc_id, mo.label,
       |    CAST(CAST(sum(CAST(CAST(CAST(f.tf AS DOUBLE) * mo.m AS VARCHAR)
       |      AS DECIMAL(28,15))) AS VARCHAR) AS DOUBLE) AS dotv
       |  FROM tf f JOIN model mo ON f.i = mo.i GROUP BY 1, 2),
       |scored AS (
       |  SELECT d.doc_id, l.label,
       |    CASE WHEN coalesce(n.dnv, 0.0) * c.cnv = 0
       |      THEN CAST('-infinity' AS DOUBLE)
       |      ELSE round(coalesce(o.dotv, 0.0) / (n.dnv * c.cnv), 6)
       |    END AS cosine
       |  FROM documents d
       |  CROSS JOIN (SELECT DISTINCT label FROM model) l
       |  JOIN cn c ON c.label = l.label
       |  LEFT JOIN dots o ON o.doc_id = d.doc_id AND o.label = l.label
       |  LEFT JOIN dn n ON n.doc_id = d.doc_id),
       |r AS (
       |  SELECT doc_id, label, cosine, ROW_NUMBER() OVER (PARTITION BY doc_id
       |    ORDER BY cosine DESC, label ASC) AS rn
       |  FROM scored)
       |SELECT doc_id, label AS pred_label, cosine FROM r WHERE rn = 1
       |ORDER BY doc_id""".stripMargin

  /** [[EvalMetrics.calibration]] of the class-0 one-vs-rest scores:
    * 10 equal-width bins over [−1, 1], per-bin counts + positive
    * fraction + exact-decimal mean score — whether the cosine's VALUE
    * (not just its rank) is trustworthy as a corpus-gating threshold.
    */
  def evalCalibration(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
    val model = Classify.centroidTrain(e, "label", "embedding")
      .filter(col("label") === 0)
    val scored = Classify.centroidScores(e, "vec_id", "embedding", model)
      .join(e.select(col("vec_id"), (col("label") === 0).as("pos")),
        Seq("vec_id"))
    EvalMetrics.calibration(scored, "cosine", "pos", bins = 10)
      .orderBy("bin")
  }

  val evalCalibrationSql: String =
    s"""WITH $centroidCtes,
       |sc AS (
       |  SELECT s.cosine, (e.label = 0) AS pos
       |  FROM scored s JOIN embeddings e USING (vec_id)
       |  WHERE s.label = 0),
       |bn AS (
       |  SELECT CAST(least(greatest(
       |      floor((cosine - -1.0) / 2.0 * 10), 0.0), 9.0) AS INT) AS bin,
       |    pos, cosine
       |  FROM sc),
       |g AS (
       |  SELECT bin, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       |    -- VARCHAR-routed decimal boundaries: see lmBackoffSql's note
       |    sum(CAST(CAST(cosine AS VARCHAR) AS DECIMAL(28,15))) AS s
       |  FROM bn GROUP BY 1)
       |SELECT bin, n, n_pos,
       |  CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS frac_pos,
       |  CAST(CAST(s AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) AS mean_score
       |FROM g ORDER BY bin""".stripMargin

  // ---- margin-based neighbor mining -----------------------------------

  /** [[graft.llm.Mining.marginMine]] between the `vec_id < 8` slice
    * (queries) and the rest of the embeddings corpus: k = 4
    * neighborhood averages, top-2 matches per query. The oracle
    * restates all-pairs round-6 cosines, both rank windows, the
    * exact-decimal neighborhood averages (VARCHAR-routed), and the
    * margin rerank.
    */
  def marginMine(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
    graft.llm.Mining.marginMine(
        e.filter(col("vec_id") < 8).select(col("vec_id").as("query_id"),
          col("embedding")),
        e.filter(col("vec_id") >= 8).select(col("vec_id").as("match_id"),
          col("embedding")),
        k = 4, topM = 2)
      .orderBy("query_id", "rank")
  }

  /** All-pairs cosine CTE between the `vec_id < 8` queries and the
    * rest — shared by `margin_mine` and `mutual_topk`.
    */
  private val miningScoredCte: String = {
    val cos = LlmGates.cosSql("a.embedding", "b.embedding",
      s"${LlmGates.normSql("a.embedding")} * ${LlmGates.normSql("b.embedding")}")
    s"""sc AS (
       |  SELECT a.vec_id AS query_id, b.vec_id AS match_id, $cos AS cosine
       |  FROM (SELECT * FROM embeddings WHERE vec_id < 8) a,
       |       (SELECT * FROM embeddings WHERE vec_id >= 8) b
       |  WHERE $cos <> CAST('-infinity' AS DOUBLE))""".stripMargin
  }

  /** [[graft.llm.Mining.mutualTopK]] over the same brute candidate
    * relation at k = 10: the reciprocal-nearest-neighbor prefilter.
    */
  def mutualTopK(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
    graft.llm.Mining.mutualTopK(
        graft.llm.Mining.cosineAllPairs(
          e.filter(col("vec_id") < 8).select(col("vec_id").as("query_id"),
            col("embedding")),
          e.filter(col("vec_id") >= 8).select(col("vec_id").as("match_id"),
            col("embedding"))),
        k = 10)
      .orderBy("query_id", "match_id")
  }

  val mutualTopKSql: String =
    s"""WITH $miningScoredCte,
       |rk AS (
       |  SELECT *,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, match_id ASC) AS ra,
       |    ROW_NUMBER() OVER (PARTITION BY match_id
       |      ORDER BY cosine DESC, query_id ASC) AS rb
       |  FROM sc)
       |SELECT query_id, match_id, cosine,
       |  CAST(ra AS INT) AS rank_ab, CAST(rb AS INT) AS rank_ba
       |FROM rk WHERE ra <= 10 AND rb <= 10
       |ORDER BY query_id, match_id""".stripMargin

  val marginMineSql: String =
    s"""WITH $miningScoredCte,
       |rk AS (
       |  SELECT *,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, match_id ASC) AS ra,
       |    ROW_NUMBER() OVER (PARTITION BY match_id
       |      ORDER BY cosine DESC, query_id ASC) AS rb
       |  FROM sc),
       |-- VARCHAR-routed decimal boundaries: see lmBackoffSql's note
       |aavg AS (
       |  SELECT query_id, CAST(CAST(sum(CAST(CAST(cosine AS VARCHAR)
       |      AS DECIMAL(28,15))) AS VARCHAR) AS DOUBLE)
       |      / CAST(count(*) AS DOUBLE) AS av
       |  FROM rk WHERE ra <= 4 GROUP BY 1),
       |bavg AS (
       |  SELECT match_id, CAST(CAST(sum(CAST(CAST(cosine AS VARCHAR)
       |      AS DECIMAL(28,15))) AS VARCHAR) AS DOUBLE)
       |      / CAST(count(*) AS DOUBLE) AS bv
       |  FROM rk WHERE rb <= 4 GROUP BY 1),
       |mg AS (
       |  SELECT r.query_id, r.match_id, r.cosine,
       |    round(r.cosine / ((a.av + b.bv) / 2.0), 6) AS margin
       |  FROM rk r JOIN aavg a USING (query_id) JOIN bavg b USING (match_id)),
       |fin AS (
       |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY margin DESC, match_id ASC) AS INT) AS rank
       |  FROM mg)
       |SELECT query_id, match_id, cosine, margin, rank FROM fin
       |WHERE rank <= 2 ORDER BY query_id, rank""".stripMargin

  // ---- DSIR importance weighting --------------------------------------

  private val DsirDim = 4096

  /** [[Dsir.importanceWeights]] with the `lang = 'en'` slice as the
    * target corpus: hashed-bigram models with add-one smoothing, the
    * mean probability-ratio weight with decimal(28,15) exact per-doc
    * sums. English documents should (and do) weight above the
    * off-target languages — asserted in DsirSpec; here the oracle
    * restates the arithmetic end-to-end.
    */
  def dsirWeights(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents")
    // flagged form: one corpus scan builds both models (value-identical
    // to importanceWeights(d, d.filter(lang='en'), …) — Dsir's note)
    Dsir.importanceWeightsFlagged(d, col("lang") === "en",
        "doc_id", "text", dim = DsirDim)
      .orderBy("doc_id")
  }

  /** The weight-computation CTE chain, ending in
    * `perdoc(doc_id, n_feats, dsir_weight)` — shared by `dsir_weights`
    * and the composed `dsir_select`.
    */
  private def dsirCtesFrom(src: String): String =
    s"""nw AS (SELECT doc_id, lang, $NormWs AS ws FROM $src),
       |bg AS (
       |  SELECT doc_id, lang, ws[i] || ' ' || ws[i + 1] AS g
       |  FROM nw, UNNEST(range(1, len(ws))) AS u(i)
       |  WHERE ws[i] <> '' AND ws[i + 1] <> ''),
       |tf AS (
       |  SELECT doc_id, ${u32Sql("g")} % $DsirDim AS i,
       |    CAST(count(*) AS BIGINT) AS tf
       |  FROM bg GROUP BY 1, 2),
       |q AS (SELECT ${u32Sql("g")} % $DsirDim AS i,
       |        CAST(count(*) AS BIGINT) AS qc
       |      FROM bg WHERE lang = 'en' GROUP BY 1),
       |p AS (SELECT ${u32Sql("g")} % $DsirDim AS i,
       |        CAST(count(*) AS BIGINT) AS pc
       |      FROM bg GROUP BY 1),
       |nq AS (SELECT CAST(coalesce(sum(qc), 0) AS BIGINT) AS nqv FROM q),
       |np AS (SELECT CAST(coalesce(sum(pc), 0) AS BIGINT) AS npv FROM p),
       |contrib AS (
       |  -- VARCHAR-routed decimal cast: see lmBackoffSql's note
       |  SELECT doc_id, tf,
       |    CAST(CAST(CAST(tf AS DOUBLE) *
       |      ((CAST(coalesce(qc, 0) + 1 AS DOUBLE) / CAST(nqv + $DsirDim AS DOUBLE))
       |       / (CAST(coalesce(pc, 0) + 1 AS DOUBLE) / CAST(npv + $DsirDim AS DOUBLE)))
       |      AS VARCHAR) AS DECIMAL(28,15)) AS r
       |  FROM tf LEFT JOIN q USING (i) LEFT JOIN p USING (i), nq, np),
       |perdoc AS (
       |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_feats,
       |    CAST(CAST(sum(r) AS VARCHAR) AS DOUBLE)
       |      / CAST(sum(tf) AS DOUBLE) AS dsir_weight
       |  FROM contrib GROUP BY 1)""".stripMargin

  val dsirWeightsSql: String =
    s"""WITH ${dsirCtesFrom("documents")}
       |SELECT d.doc_id, CAST(coalesce(w.n_feats, 0) AS BIGINT) AS n_feats,
       |  w.dsir_weight
       |FROM documents d LEFT JOIN perdoc w USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  /** The composed DSIR selection: [[Dsir.importanceWeights]] →
    * [[Dsir.resampleTop]] at n = 100 — the actual training-slice draw,
    * verified end-to-end as ONE chained oracle (weights, the
    * (weight desc, id) cut, and the deterministic survivor set).
    */
  def dsirSelect(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents")
    val w = Dsir.importanceWeightsFlagged(d, col("lang") === "en",
      "doc_id", "text", dim = DsirDim)
    Dsir.resampleTop(w, "doc_id", n = 100).orderBy("doc_id")
  }

  val dsirSelectSql: String =
    s"""WITH ${dsirCtesFrom("documents")},
       |sel AS (
       |  SELECT doc_id, n_feats, dsir_weight FROM perdoc
       |  WHERE dsir_weight IS NOT NULL
       |  ORDER BY dsir_weight DESC, doc_id ASC LIMIT 100)
       |SELECT doc_id, n_feats, dsir_weight FROM sel
       |ORDER BY doc_id""".stripMargin

  /** The curation-tier capstone, verified end-to-end as ONE chained
    * oracle (the `llm_clean_corpus` pattern): Gopher keep (natural
    * corpus, minStopwords 0 so ok_words is the live rule) → DSIR
    * weights against the en survivors → deterministic top-100 select →
    * leakage-stable hash split. Every stage already has its own gate;
    * this one proves the COMPOSITION (survivor set feeds the models,
    * the cut feeds the split) with no per-stage drift.
    */
  def curationSelect(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents")
    val kept = Gopher.keepDocs(d, "doc_id", "text", minStopwords = 0)
    // one scan of the Gopher-filtered survivors builds BOTH dsir models
    // (the generic two-relation form re-ran the whole Gopher battery
    // for the target side)
    val w = Dsir.importanceWeightsFlagged(kept, col("lang") === "en",
      "doc_id", "text", dim = DsirDim)
    val sel = Dsir.resampleTop(w, "doc_id", n = 100)
    graft.operators.Sampling.hashSplit(sel, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .orderBy("doc_id")
  }

  val curationSelectSql: String = {
    def thr(c: Double): Long =
      math.min(math.round(c * 4294967296.0), 4294967296L)
    s"""WITH ${gopherCtes("documents", 0)},
       |kdocs AS (
       |  SELECT d.doc_id, d.text, d.lang FROM documents d
       |  JOIN gverd g ON g.doc_id = d.doc_id AND g.keep),
       |${dsirCtesFrom("kdocs")},
       |csel AS (
       |  SELECT doc_id, n_feats, dsir_weight FROM perdoc
       |  WHERE dsir_weight IS NOT NULL
       |  ORDER BY dsir_weight DESC, doc_id ASC LIMIT 100)
       |SELECT doc_id, n_feats, dsir_weight,
       |  CASE WHEN h < ${thr(0.8)} THEN 'train'
       |       WHEN h < ${thr(0.9)} THEN 'val'
       |       ELSE 'test' END AS split
       |FROM (SELECT *, ${u32Sql("CAST(doc_id AS VARCHAR)")} AS h FROM csel)
       |ORDER BY doc_id""".stripMargin
  }

  // ---- temperature-scaled mixture rates -------------------------------

  /** [[graft.operators.Mixing.temperatureRates]] over per-language
    * character mass: the α = 0.5 up-sampling schedule. The oracle
    * restates the sqrt rates with the exact-decimal divisor
    * (VARCHAR-routed) and the natural-share boost.
    */
  def temperatureMix(s: SparkSession, dir: String): DataFrame =
    graft.operators.Mixing.temperatureRates(
        Tables(s, dir, "documents"), Seq("lang"), "n_chars")
      .orderBy("lang")

  val temperatureMixSql: String =
    """WITH g AS (
      |  SELECT lang, CAST(sum(n_chars) AS BIGINT) AS n_weight
      |  FROM documents GROUP BY 1),
      |s AS (SELECT *, sqrt(CAST(n_weight AS DOUBLE)) AS sv FROM g),
      |-- VARCHAR-routed decimal boundaries: see lmBackoffSql's note
      |t AS (
      |  SELECT CAST(sum(n_weight) AS BIGINT) AS tw,
      |    CAST(CAST(sum(CAST(CAST(sv AS VARCHAR) AS DECIMAL(28,15)))
      |      AS VARCHAR) AS DOUBLE) AS ts
      |  FROM s)
      |SELECT lang, n_weight, sv / ts AS rate,
      |  (sv / ts) / (CAST(n_weight AS DOUBLE) / CAST(tw AS DOUBLE)) AS boost
      |FROM s, t ORDER BY lang""".stripMargin

  // ---- out-of-vocabulary rate -----------------------------------------

  /** [[graft.llm.TextStats.oovRate]] of the `doc_id % 5 = 0` held-out
    * slice against a min-df-2 vocabulary built on the other four
    * fifths — the tokenizer-coverage check. Instance-counted: repeated
    * unknown tokens each count. The synthetic corpus shares one lorem
    * vocabulary across the split (natural OOV is zero — a vacuous
    * band), so the `doc_id % 10 = 0` half of the held-out slice PLANTS
    * three copies of a per-doc novel token on both sides; the other
    * half stays clean, populating both sides of the rate.
    */
  def oovRateGate(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents")
    val vocab = graft.llm.TextStats.buildVocabulary(
      d.filter(col("doc_id") % 5 =!= 0), "doc_id", "text",
      minDf = 2, maxDfPct = 100, topK = 100000)
    val idStr = col("doc_id").cast("string")
    val held = d.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"),
        when(col("doc_id") % 10 === 0,
            concat(col("text"), lit(" novel"), idStr, lit(" novel"), idStr,
              lit(" novel"), idStr))
          .otherwise(col("text")).as("text"))
    graft.llm.TextStats.oovRate(held, "doc_id", "text", vocab)
      .orderBy("doc_id")
  }

  val oovRateSql: String =
    s"""WITH tr AS (SELECT * FROM documents WHERE doc_id % 5 <> 0),
       |pd AS (
       |  SELECT doc_id, unnest(list_distinct($NormWs)) AS token FROM tr),
       |dfq AS (
       |  SELECT token, CAST(count(*) AS BIGINT) AS doc_freq
       |  FROM pd WHERE token <> '' GROUP BY 1),
       |vocab AS (SELECT token FROM dfq WHERE doc_freq >= 2),
       |ho AS (
       |  SELECT doc_id, CASE WHEN doc_id % 10 = 0
       |    THEN text || ' novel' || CAST(doc_id AS VARCHAR)
       |      || ' novel' || CAST(doc_id AS VARCHAR)
       |      || ' novel' || CAST(doc_id AS VARCHAR)
       |    ELSE text END AS text
       |  FROM documents WHERE doc_id % 5 = 0),
       |tok AS (SELECT doc_id, unnest($NormWs) AS token FROM ho),
       |tk AS (SELECT doc_id, token FROM tok WHERE token <> ''),
       |per AS (
       |  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |    CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
       |  FROM tk t LEFT JOIN vocab v USING (token) GROUP BY 1)
       |SELECT h.doc_id, coalesce(n_tokens, 0) AS n_tokens,
       |  coalesce(n_oov, 0) AS n_oov,
       |  CASE WHEN coalesce(n_tokens, 0) = 0 THEN NULL
       |    ELSE CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE)
       |  END AS oov_rate
       |FROM ho h LEFT JOIN per USING (doc_id)
       |ORDER BY h.doc_id""".stripMargin

  // ---- rules-then-model filter stack ------------------------------------

  /** Pinned 33-weight classifier head for the stack gate — a
    * deterministic small-magnitude pattern (literal on both sides, so
    * the oracle needs no training chain; the TRAINED loop is
    * `logreg_text`'s job).
    */
  private val StackW: Array[Double] =
    Array.tabulate(33)(j => ((j * 29) % 11 - 5) / 50.0)

  /** [[graft.llm.Curation.filterStack]] at natural thresholds
    * (minStopwords 0 — the synthetic corpus has no English stopwords):
    * Gopher battery ∧ not-repetitive, then the pinned classifier head
    * scoring only rule survivors, `keep` at score ≥ 0.46 (the pinned head's scores sit near 0.46;
    * the boundary is placed inside the distribution so both verdicts
    * populate — 0.5 would vacuously reject every survivor).
    */
  def qualityStack(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val model = s.createDataset(StackW.toSeq.zipWithIndex
      .map { case (w, j) => (j, w) }).toDF("j", "w")
    graft.llm.Curation.filterStack(Tables(s, dir, "documents"), "doc_id",
        "text", model, minScore = 0.46, dim = 32, scale = 64.0,
        minStopwords = 0)
      .orderBy("doc_id")
  }

  val qualityStackSql: String = {
    val wLit = StackW.mkString("[", ", ", "]::DOUBLE[]")
    s"""WITH ${gopherCtes("documents", 0)},
       |grules AS (SELECT doc_id, keep AS gopher_keep FROM gverd),
       |rrules AS (
       |  SELECT doc_id, repetitive
       |  FROM (${PipelineGates.qualityRepetitionSql})),
       |rules AS (
       |  SELECT g.doc_id, g.gopher_keep, r.repetitive
       |  FROM grules g JOIN rrules r ON g.doc_id = r.doc_id),
       |surv AS (
       |  SELECT d.doc_id, d.text FROM documents d
       |  JOIN rules ru ON ru.doc_id = d.doc_id
       |  WHERE ru.gopher_keep AND NOT ru.repetitive),
       |stk AS (
       |  SELECT doc_id, unnest(string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ')) AS t
       |  FROM surv),
       |stfc AS (
       |  SELECT doc_id, ${PipelineGates.shardFoldSql("t", 32)} AS i,
       |    CAST(count(*) AS BIGINT) AS c
       |  FROM stk WHERE t <> '' GROUP BY 1, 2),
       |sax AS (
       |  SELECT d.doc_id, js.j,
       |    CASE WHEN js.j = 0 THEN 1.0::DOUBLE
       |      ELSE CAST(coalesce(f.c, 0) AS DOUBLE) / 64.0 END AS x
       |  FROM surv d
       |  CROSS JOIN (SELECT unnest(range(0, 33)) AS j) js
       |  LEFT JOIN stfc f ON f.doc_id = d.doc_id AND f.i = js.j - 1),
       |smg AS (
       |  SELECT doc_id,
       |    CAST(CAST(sum(CAST(CAST(x * ($wLit)[j + 1] AS VARCHAR) AS DECIMAL(28,15))) AS VARCHAR) AS DOUBLE) AS m
       |  FROM sax GROUP BY doc_id),
       |ssc AS (
       |  SELECT doc_id,
       |    floor((0.5 * (1.0 + m / (1.0 + abs(m)))) * 1000000 + 0.5) / 1000000 AS score
       |  FROM smg)
       |SELECT ru.doc_id, ru.gopher_keep, ru.repetitive, s.score,
       |  (ru.gopher_keep AND NOT ru.repetitive
       |    AND coalesce(s.score >= 0.46, FALSE)) AS keep
       |FROM rules ru LEFT JOIN ssc s ON s.doc_id = ru.doc_id
       |ORDER BY ru.doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "quality_stack"      -> (qualityStack _),
    "gopher_rules"       -> (gopherRules _),
    "c4_filters"         -> (c4Filters _),
    "embed_gram"         -> (embedGram _),
    "embed_drift"        -> (embedDrift _),
    "embed_standardize"  -> (embedStandardize _),
    "span_corrupt"       -> (spanCorruptGate _),
    "classify_centroid"  -> (classifyCentroid _),
    "classify_text"      -> (classifyText _),
    "classify_confusion" -> (classifyConfusion _),
    "classify_report"    -> (classifyReport _),
    "eval_auc"           -> (evalAuc _),
    "eval_calibration"   -> (evalCalibration _),
    "margin_mine"        -> (marginMine _),
    "mutual_topk"        -> (mutualTopK _),
    "dsir_weights"       -> (dsirWeights _),
    "dsir_select"        -> (dsirSelect _),
    "curation_select"    -> (curationSelect _),
    "temperature_mix"    -> (temperatureMix _),
    "oov_rate"           -> (oovRateGate _))

  val oracleSql: Map[String, String] = Map(
    "quality_stack"      -> qualityStackSql,
    "gopher_rules"       -> gopherRulesSql,
    "c4_filters"         -> c4FiltersSql,
    "embed_gram"         -> embedGramSql,
    "embed_drift"        -> embedDriftSql,
    "embed_standardize"  -> embedStandardizeSql,
    "span_corrupt"       -> spanCorruptSql,
    "classify_centroid"  -> classifyCentroidSql,
    "classify_text"      -> classifyTextSql,
    "classify_confusion" -> classifyConfusionSql,
    "classify_report"    -> classifyReportSql,
    "eval_auc"           -> evalAucSql,
    "eval_calibration"   -> evalCalibrationSql,
    "margin_mine"        -> marginMineSql,
    "mutual_topk"        -> mutualTopKSql,
    "dsir_weights"       -> dsirWeightsSql,
    "dsir_select"        -> dsirSelectSql,
    "curation_select"    -> curationSelectSql,
    "temperature_mix"    -> temperatureMixSql,
    "oov_rate"           -> oovRateSql)
}
