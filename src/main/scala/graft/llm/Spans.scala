package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact duplicate-SPAN profiling — the "exact substring dedup" family
  * of training-data pipelines (Lee et al. 2022, *Deduplicating Training
  * Data Makes Language Models Better*): a document that survives
  * document-level dedup can still carry long word spans repeated
  * verbatim across the corpus (licenses, navigation chrome, quoted
  * boilerplate), and those spans are what the model memorizes.
  *
  * [[dupSpanProfile]] reports, per document, how many of its tokens are
  * covered by some `spanLen`-word span that also appears in at least
  * `minDocs − 1` OTHER documents. Downstream policy (drop above a
  * `dup_frac` threshold, or trim the spans) sits on top of this profile.
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
  *     token positions with a distinct — again partial-agged, bounded
  *     per doc by its token count;
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

  /** Per-document duplicated-span coverage: `(idCol, n_tokens,
    * dup_tokens, dup_frac)` for every input row. `n_tokens` follows the
    * repo-wide empty→0 convention (TextStats.tokenCount); documents
    * shorter than `spanLen` words contribute no spans and score 0.
    * Overlapping duplicated spans count each covered token ONCE.
    */
  def dupSpanProfile(df: DataFrame, idCol: String, textCol: String,
                     spanLen: Int = 8, minDocs: Int = 2): DataFrame = {
    require(spanLen >= 2, s"spanLen must be >= 2, got $spanLen")
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val norm = Dedup.normalize(col(textCol))
    val base = df.select(col(idCol),
      when(norm === "", 0).otherwise(size(split(norm, " "))).as("n_tokens"),
      norm.as("__norm"))
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
    val covered = posting.join(dupSpans, Seq("__g"), "left_semi")
      .select(col(idCol),
        explode(sequence(col("__pos"), col("__pos") + lit(spanLen - 1))).as("__t"))
      .distinct()
      .groupBy(col(idCol)).agg(count(lit(1)).cast("int").as("dup_tokens"))
    base.select(col(idCol), col("n_tokens"))
      .join(covered, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("dup_tokens"), lit(0)).as("dup_tokens"))
      .withColumn("dup_frac", when(col("n_tokens") === 0, lit(0.0))
        .otherwise(round(col("dup_tokens").cast("double") / col("n_tokens"), 6)))
  }
}
