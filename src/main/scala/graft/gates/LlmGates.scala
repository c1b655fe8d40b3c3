package graft.gates

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.llm.{Ann, Dedup, Multimodal, TextStats}

/** Correctness gates for the LLM-data-pipeline operators over
  * `documents.parquet` / `embeddings.parquet`.
  *
  * DuckDB-expressible operators get full oracles (text stats, exact
  * dedup, brute-force ANN). The xxhash64-based ones (MinHash, SimHash,
  * LSH) have no DuckDB equivalent → no oracleSql entry, driver records the
  * rows-only check; their cross-checks live in ScalaTest (LSH recall vs
  * brute force, near-dup symmetry).
  */
object LlmGates {

  /** Exact dedup with a full oracle. The synthetic docs are all distinct,
    * so dedup must be the identity — the oracle proves exactly that via
    * the same min-per-digest window.
    */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exactDedup(Tables(s, dir, "documents"), "doc_id", "text")
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy("doc_id")

  val dedupExactSql: String =
    """SELECT doc_id, lang, source, n_chars
      |FROM (SELECT *, ROW_NUMBER() OVER (
      |        PARTITION BY md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'))
      |        ORDER BY doc_id) AS rn
      |      FROM documents)
      |WHERE rn = 1 ORDER BY doc_id""".stripMargin

  /** Text statistics with a full oracle (token/char counts, ratios,
    * fingerprint). The synthetic text is single-space word soup, so the
    * whitespace split is engine-agnostic.
    */
  def textStats(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents")
    d.select(
        col("doc_id"),
        TextStats.tokenCount(col("text")).cast("long").as("n_tokens"),
        TextStats.charCount(col("text")).cast("long").as("n_chars_computed"),
        TextStats.approxBpeTokens(col("text")).cast("long").as("n_bpe_tokens"),
        round(TextStats.avgWordLen(col("text")), 6).as("avg_word_len"),
        TextStats.fingerprint(col("text")).as("fingerprint"))
      .orderBy("doc_id")
  }

  val textStatsSql: String =
    """SELECT doc_id,
      |  len(string_split(trim(text), ' ')) AS n_tokens,
      |  length(text) AS n_chars_computed,
      |  len(regexp_extract_all(text, '\w{1,4}|[^\w\s]')) AS n_bpe_tokens,
      |  round(CAST(length(replace(trim(text), ' ', '')) AS DOUBLE)
      |        / len(string_split(trim(text), ' ')), 6) AS avg_word_len,
      |  md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fingerprint
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Brute-force cosine top-5 for queries vec_id < 5, with a DuckDB
    * list_cosine_similarity oracle. Ranking on the 6-decimal-rounded
    * cosine (neighbor id tiebreak) is engine-stable.
    */
  def annTopK(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val corpus = e.select(col("vec_id").as("neighbor_id"), col("embedding"))
    Ann.bruteForceTopK(queries, corpus, k = 5)
      .orderBy("query_id", "rank")
  }

  val annTopKSql: String =
    """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
      |scored AS (
      |  SELECT q.query_id, e.vec_id AS neighbor_id,
      |         round(list_cosine_similarity(CAST(q.qv AS DOUBLE[]),
      |                                      CAST(e.embedding AS DOUBLE[])), 6) AS cosine
      |  FROM q, embeddings e WHERE e.vec_id <> q.query_id),
      |ranked AS (
      |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      |            ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
      |  FROM scored)
      |SELECT query_id, neighbor_id, cosine, rank FROM ranked
      |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** MinHash/LSH near-dup pairs — rows-only (xxhash64 signatures are not
    * expressible in DuckDB). Low threshold so the word-soup corpus yields
    * a non-empty, deterministic pair set.
    */
  def dedupMinhash(s: SparkSession, dir: String): DataFrame =
    Dedup.nearDupMinhash(Tables(s, dir, "documents"), "doc_id", "text",
        threshold = 0.1, numHashes = 32, bands = 8, shingleN = 2)
      .orderBy("id_a", "id_b")

  /** SimHash near-dup pairs — rows-only. */
  def dedupSimhash(s: SparkSession, dir: String): DataFrame =
    Dedup.nearDupSimhash(Tables(s, dir, "documents"), "doc_id", "text",
        maxDistance = 8, maxBucket = 500)
      .orderBy("id_a", "id_b")

  /** LSH-bucketed approximate top-k — rows-only; its recall against the
    * brute-force baseline is asserted in LlmSpec.
    */
  def annLsh(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val corpus = e.select(col("vec_id").as("neighbor_id"), col("embedding"))
    Ann.lshTopK(queries, corpus, k = 5, bits = 10)
      .orderBy("query_id", "rank")
  }

  /** IVF-bucketed approximate top-k — rows-only (deterministic centroid
    * sample; recall asserted vs brute force in LlmSpec).
    */
  def annIvf(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val corpus = e.select(col("vec_id").as("neighbor_id"), col("embedding"))
    Ann.ivfTopK(queries, corpus, k = 5, stride = 50, nprobe = 4)
      .orderBy("query_id", "rank")
  }

  /** Language-ID + quality score over the documents — rows-only (the
    * heuristic's stopword profiles aren't worth mirroring in SQL; its
    * behavior is unit-tested on real sentences in LlmSpec).
    */
  def textQuality(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").select(
        col("doc_id"),
        TextStats.langId(col("text")).as("lang_pred"),
        TextStats.qualityScore(col("text")).as("quality"),
        round(TextStats.punctRatio(col("text")), 6).as("punct_ratio"),
        round(TextStats.stopwordRatio(col("text")), 6).as("stopword_ratio"))
      .orderBy("doc_id")

  /** Rolling-hash fingerprints via the custom codegen'd Catalyst
    * expression — rows-only (the O(n) rolling arithmetic has no DuckDB
    * equivalent; codegen/interpreted/reference agreement is asserted in
    * RollingHashSpec).
    */
  def textRollingFp(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").select(
        col("doc_id"),
        graft.expressions.RollingHashMin.rolling_hash_min(col("text"), 16)
          .as("rolling_fp"))
      .orderBy("doc_id")

  /** Multimodal plumbing — rows-only: text bytes as the opaque binary
    * column, stub feature extraction through the real mapPartitions path.
    */
  def multimodalFeatures(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("media"))
    Multimodal.extractFeatures(d, "doc_id", "media")
      .select(col("doc_id"), round(element_at(col("features"), 1), 6).as("f0"),
        round(element_at(col("features"), 8), 6).as("f7"),
        size(col("features")).as("dim"))
      .orderBy("doc_id")
  }

  /** Embedding-cosine near-dup pairs via shared LSH buckets — rows-only
    * (library cross-checks in LlmSpec). Threshold tuned to the synthetic
    * near-uniform embeddings so the pair set is non-empty.
    */
  def dedupEmbedding(s: SparkSession, dir: String): DataFrame =
    Ann.nearDupCosine(Tables(s, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.3, bits = 8)
      .orderBy("id_a", "id_b")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_embedding"     -> (dedupEmbedding _),
    "dedup_exact"         -> (dedupExact _),
    "text_stats"          -> (textStats _),
    "ann_topk"            -> (annTopK _),
    "dedup_minhash"       -> (dedupMinhash _),
    "dedup_simhash"       -> (dedupSimhash _),
    "ann_lsh"             -> (annLsh _),
    "ann_ivf"             -> (annIvf _),
    "text_quality"        -> (textQuality _),
    "text_rolling_fp"     -> (textRollingFp _),
    "multimodal_features" -> (multimodalFeatures _))

  val oracleSql: Map[String, String] = Map(
    "dedup_exact" -> dedupExactSql,
    "text_stats"  -> textStatsSql,
    "ann_topk"    -> annTopKSql)
}
