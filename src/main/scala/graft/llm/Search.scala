package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 full-text retrieval: score every document against a LITERAL
  * query and return the global top-k — the ranking function under
  * lexical search, RAG candidate generation, and seed-document mining.
  *
  * The idf is the Robertson rational form WITHOUT the log:
  * `(N - df + 0.5) / (df + 0.5)`. The log is a monotone transform of
  * this ratio per term, but across terms log damping does change relative
  * weights — same trade-off as [[Keywords]]' linear idf, accepted for the
  * same reason: every arithmetic step here (int→double casts, one
  * division) is exactly rounded IEEE, so Spark and the SQL oracle produce
  * the bitwise-identical double and the gate can hash-compare without a
  * rounding fudge. All constants reach the expression as INTEGER
  * literals (df, N, Σdl) with the double math done inside the engine —
  * embedding a pre-computed double literal would re-introduce a
  * format/parse rounding hazard.
  *
  * Per-term contribution (textbook BM25 otherwise):
  * `idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))`, summed over query
  * terms in the caller's order (fixed left-to-right fold — float addition
  * is order-sensitive, so the oracle must sum in the same order; a Spark
  * `sum()` aggregation would be partition-order-nondeterministic).
  *
  * Scale shape: for a literal query the whole scoring pass is NARROW —
  * `tf` per term is `size(filter(tokens, _ == term))` on the row, no
  * explode, no shuffle — and the top-k is a TakeOrderedAndProject
  * (per-partition heads merged on the driver, never a global sort). The
  * only other work is ONE corpus aggregation (a single partial-agg'd
  * job) to resolve N, Σdl, and per-term df, collected as one bounded row
  * of |query|+2 longs. Two passes over `docs` total — cache the input or
  * reuse `CorpusSearchStats` across queries to pay the stats pass once.
  *
  * Documents matching no query term (score 0) are dropped: "no overlap"
  * is a non-result, and keeping zeros would make top-k order depend on
  * id order among the zero tail.
  */
object Search {

  /** N, Σdl, and df per query term — collect once via [[corpusStats]],
    * reuse across queries over the same corpus snapshot. */
  final case class CorpusSearchStats(nDocs: Long, sumDl: Long, df: Map[String, Long])

  private def tokens(textCol: Column): Column =
    split(Dedup.normalize(textCol), " ")

  /** Doc length in tokens; blank/null text is 0 tokens (TextStats
    * convention — a bare split of "" yields one phantom empty token). */
  private def docLen(textCol: Column): Column =
    when(textCol.isNull || trim(textCol) === "", lit(0L))
      .otherwise(size(tokens(textCol)).cast("long"))

  private def termTf(textCol: Column, term: String): Column =
    when(textCol.isNull || trim(textCol) === "", lit(0L))
      .otherwise(size(filter(tokens(textCol), t => t === lit(term))).cast("long"))

  /** Normalize a user query to the corpus tokenization: lowercase,
    * trimmed, blanks dropped, first occurrence wins (order is preserved
    * — it fixes the score summation order). */
  def normalizeQuery(query: Seq[String]): Seq[String] =
    query.map(_.trim.toLowerCase).filter(_.nonEmpty).distinct

  def corpusStats(docs: DataFrame, textCol: String, query: Seq[String]): CorpusSearchStats = {
    val terms = normalizeQuery(query)
    require(terms.nonEmpty, "query has no usable terms")
    val t = col(textCol)
    val aggs = count(lit(1)).as("n") +: sum(docLen(t)).as("sdl") +:
      terms.zipWithIndex.map { case (term, i) =>
        sum((termTf(t, term) > 0).cast("long")).as(s"df_$i")
      }
    val r = docs.agg(aggs.head, aggs.tail: _*).head()
    CorpusSearchStats(
      nDocs = r.getLong(0),
      sumDl = if (r.isNullAt(1)) 0L else r.getLong(1),
      df = terms.zipWithIndex.map { case (term, i) =>
        term -> (if (r.isNullAt(i + 2)) 0L else r.getLong(i + 2))
      }.toMap)
  }

  /** Reciprocal-rank-fusion hybrid retrieval: the standard way to combine
    * a lexical ranking (BM25) with a vector ranking (cosine vs a literal
    * query embedding) without calibrating their incomparable score
    * scales — each arm contributes `1/(kRrf + rank)` and only the RANKS
    * matter, which is also what makes the fusion engine-portable: the
    * two divisions and one addition (fixed lexical-then-vector order)
    * are exactly-rounded IEEE ops on small integers.
    *
    * Output: `(idCol, lex_rank, vec_rank, rrf)` — top `k` by fused
    * score, ranks null where a document appears in only one arm (its
    * missing arm contributes 0, the textbook convention).
    *
    * Scale shape: both arms end in `TakeOrderedAndProject` (the BM25
    * scan is narrow per [[bm25TopK]]; the vector arm is one narrow
    * cosine scan against literal query planes — no index needed at
    * corpus scale because each arm touches every row exactly once and
    * keeps `kEach`). Everything after the two top-k's operates on
    * ≤ 2·kEach rows: the rank windows and the full-outer fuse join are
    * bounded by construction, not by data volume.
    */
  def hybridTopK(docs: DataFrame, embeddings: DataFrame,
                 idCol: String, textCol: String,
                 vecIdCol: String, vecCol: String,
                 query: Seq[String], queryVec: Seq[Double],
                 k: Int = 10, kEach: Int = 50, kRrf: Int = 60,
                 stats: Option[CorpusSearchStats] = None): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(kEach >= k, s"kEach ($kEach) must be >= k ($k)")
    require(kRrf >= 1, s"kRrf must be positive, got $kRrf")
    require(queryVec.nonEmpty, "queryVec must be non-empty")
    import org.apache.spark.sql.expressions.Window
    val lex = bm25TopK(docs, idCol, textCol, query, kEach, stats = stats)
      .select(col(idCol).as("__id"), col("score"))
      .select(col("__id"), row_number()
        .over(Window.orderBy(col("score").desc, col("__id").asc))
        .as("lex_rank"))
    val qv = typedLit(queryVec)
    val qn = Ann.norm(qv)
    val cn = Ann.norm(col(vecCol))
    val cos = when(cn * qn === 0.0, lit(Double.NegativeInfinity))
      .otherwise(round(Ann.dot(col(vecCol), qv) / (cn * qn), 6))
    val vec = embeddings
      .select(col(vecIdCol).as("__id"), cos.as("__cos"))
      .orderBy(col("__cos").desc, col("__id").asc).limit(kEach)
      .select(col("__id"), row_number()
        .over(Window.orderBy(col("__cos").desc, col("__id").asc))
        .as("vec_rank"))
    val arm = (r: Column) =>
      coalesce(lit(1.0) / (lit(kRrf.toDouble) + r.cast("double")), lit(0.0))
    lex.join(vec, Seq("__id"), "full_outer")
      .select(col("__id").as(idCol), col("lex_rank"), col("vec_rank"),
        (arm(col("lex_rank")) + arm(col("vec_rank"))).as("rrf"))
      .orderBy(col("rrf").desc, col(idCol).asc)
      .limit(k)
  }

  /** Top-k documents by BM25 against `query`. Output:
    * `(idCol, dl, score)`, highest score first, ties broken by id. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               query: Seq[String], k: Int = 10,
               k1: Double = 1.2, b: Double = 0.75,
               stats: Option[CorpusSearchStats] = None): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val terms = normalizeQuery(query)
    require(terms.nonEmpty, "query has no usable terms")
    val st = stats.getOrElse(corpusStats(docs, textCol, query))
    val t = col(textCol)
    val nD = lit(st.nDocs).cast("double")
    // avgdl from the two integer totals, divided in-engine (see header)
    val avgdl = lit(st.sumDl).cast("double") / nD
    val dlD = docLen(t).cast("double")
    val contribs = terms.map { term =>
      val dfL = lit(st.df(term)).cast("double")
      val idf = (nD - dfL + lit(0.5)) / (dfL + lit(0.5))
      val tf = termTf(t, term).cast("double")
      idf * ((tf * (lit(k1) + lit(1.0))) /
        (tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * (dlD / avgdl))))
    }
    val score = contribs.reduceLeft(_ + _) // fixed fold order, see header
    docs.select(col(idCol), docLen(t).as("dl"), score.as("score"))
      .filter(col("score") > 0.0)
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }
}
