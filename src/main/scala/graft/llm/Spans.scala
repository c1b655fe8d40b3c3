package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact duplicate-SPAN handling — the "exact substring dedup" family
  * of training-data pipelines (Lee et al. 2022, *Deduplicating Training
  * Data Makes Language Models Better*): a document that survives
  * document-level dedup can still carry long word spans repeated
  * verbatim across the corpus (licenses, navigation chrome, quoted
  * boilerplate), and those spans are what the model memorizes.
  *
  * Two operators over one shared pipeline:
  *   - [[dupSpanProfile]] reports, per document, how many of its tokens
  *     are covered by some `spanLen`-word span that also appears in at
  *     least `minDocs − 1` OTHER documents (the drop-above-threshold
  *     policy input);
  *   - [[trimDupSpans]] actually REMOVES the covered tokens (the Lee et
  *     al. cut policy), returning the normalized text with every
  *     duplicated span excised once-per-token.
  *
  * Shape at scale: one posting row per TOKEN of the corpus (doc, start
  * position, md5 of the span), i.e. linear in corpus size like
  * tokenization itself —
  *
  *   - cross-doc span counting is `(span, doc) distinct → count`, both
  *     phases with map-side partial aggregation; a boilerplate span in
  *     every document partial-aggs to one row per partition, never a
  *     hot task;
  *   - per-doc coverage joins the postings back over the (small)
  *     duplicated-span set with a LEFT-SEMI join, then unions covered
  *     token positions per doc — bounded by each doc's token count;
  *   - membership at trim time is `array_except` over position arrays
  *     (hash-based, O(tokens + covered)), never a per-token
  *     `array_contains` scan (quadratic on a fully-covered doc);
  *   - the postings relation is deliberately NOT checkpointed: it is
  *     corpus-sized, and recomputing it (split + chained concats, all
  *     codegen'd Column ops) for its two consumers is cheaper than
  *     materializing a corpus-scale intermediate.
  *
  * Spans are keyed by `md5(span text)` on BOTH the Spark and oracle
  * sides — fixed-width shuffle keys instead of ~50-char strings, with
  * identical collision semantics in any engine.
  */
object Spans {

  /** `(idCol, n_tokens, __norm)` with the repo-wide empty→0 token
    * convention (TextStats.tokenCount). */
  private def withTokens(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val norm = Dedup.normalize(col(textCol))
    df.select(col(idCol),
      when(norm === "", 0).otherwise(size(split(norm, " "))).as("n_tokens"),
      norm.as("__norm"))
  }

  /** Per-doc SORTED array of token positions covered by a cross-doc
    * duplicated span — the shared core of profile and trim. Only docs
    * with at least one covered token appear.
    */
  private def coveredPositions(base: DataFrame, idCol: String,
                               spanLen: Int, minDocs: Int): DataFrame = {
    val posting = base.filter(col("n_tokens") >= spanLen)
      .select(col(idCol),
        posexplode(Dedup.shingles(col("__norm"), spanLen)).as(Seq("__pos", "__gram")))
      .select(col(idCol), col("__pos"), md5(col("__gram")).as("__g"))
    // spans seen in >= minDocs distinct docs; the (span, doc) distinct
    // makes a span repeated WITHIN one doc count that doc once
    val dupSpans = posting.select(col(idCol), col("__g")).distinct()
      .groupBy("__g").agg(count(lit(1)).as("__d"))
      .filter(col("__d") >= minDocs)
      .select("__g")
    posting.join(dupSpans, Seq("__g"), "left_semi")
      .select(col(idCol),
        explode(sequence(col("__pos"), col("__pos") + lit(spanLen - 1))).as("__t"))
      .distinct()
      .groupBy(col(idCol)).agg(sort_array(collect_list(col("__t"))).as("__cov"))
  }

  /** Per-document duplicated-span coverage: `(idCol, n_tokens,
    * dup_tokens, dup_frac)` for every input row. Documents shorter than
    * `spanLen` words contribute no spans and score 0. Overlapping
    * duplicated spans count each covered token ONCE.
    */
  def dupSpanProfile(df: DataFrame, idCol: String, textCol: String,
                     spanLen: Int = 8, minDocs: Int = 2): DataFrame = {
    require(spanLen >= 2, s"spanLen must be >= 2, got $spanLen")
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val base = withTokens(df, idCol, textCol)
    base.select(col(idCol), col("n_tokens"))
      .join(coveredPositions(base, idCol, spanLen, minDocs), Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(size(col("__cov")), lit(0)).as("dup_tokens"))
      .withColumn("dup_frac", when(col("n_tokens") === 0, lit(0.0))
        .otherwise(round(col("dup_tokens").cast("double") / col("n_tokens"), 6)))
  }

  /** Remove every cross-doc duplicated span from each document:
    * `(idCol, text_clean)` where `text_clean` is the NORMALIZED text
    * (lowercased, whitespace-collapsed — trimming operates on the same
    * token stream the spans were found in) with covered tokens dropped
    * and survivors rejoined with single spaces. A doc with no
    * duplicated spans comes back as its normalized self.
    */
  def trimDupSpans(df: DataFrame, idCol: String, textCol: String,
                   spanLen: Int = 8, minDocs: Int = 2): DataFrame = {
    require(spanLen >= 2, s"spanLen must be >= 2, got $spanLen")
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val base = withTokens(df, idCol, textCol)
    base.join(coveredPositions(base, idCol, spanLen, minDocs), Seq(idCol), "left")
      .select(col(idCol),
        // kept = positions \ covered via hash-based array_except (order-
        // preserving on the left arg); guard n_tokens = 0 — sequence
        // would otherwise step DOWN from 0 to -1
        when(col("n_tokens") === 0, lit("")).otherwise(
          array_join(
            transform(
              array_except(
                sequence(lit(0), col("n_tokens") - 1),
                coalesce(col("__cov"), array().cast("array<int>"))),
              p => element_at(split(col("__norm"), " "), p + 1)),
            " ")).as("text_clean"))
  }
}
