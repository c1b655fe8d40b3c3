package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher/C4-style repetition quality metrics: the cheap statistical
  * filters that catch boilerplate, keyword-stuffed and looping text
  * before any model-based scorer runs.
  *
  * Two families:
  *   - per-row ratios (unique-word fraction) — narrow, codegen'd;
  *   - most-frequent-n-gram fraction — needs a per-document mode, which
  *     no native expression computes in O(n); we explode n-grams and
  *     aggregate. Both shuffles are doc-id-keyed with map-side partial
  *     aggregation, so at corpus scale the cost is one token-count-sized
  *     shuffle, no global hotspot (documents are the natural partition
  *     unit and no document is larger than one task).
  */
object Repetition {

  /** size(array_distinct(words)) / size(words); 0 for empty text. */
  def uniqueWordFrac(text: Column): Column = {
    val ws = split(Dedup.normalize(text), " ")
    when(trim(text) === "" || text.isNull, 0.0)
      .otherwise(size(array_distinct(ws)).cast("double") / size(ws))
  }

  /** Word bigrams of the normalized text ("a b", "b c", ...).
    *
    * One [[graft.expressions.WordShingles]] pass. The previous
    * `transform` form re-evaluated `element_at(split(...), i+2)` — the
    * WHOLE split+regex tree — once per element inside the interpreted
    * lambda, i.e. O(words²) regex work per document; it alone made a
    * fully-materialized [[profile]] ~50× slower than its scan.
    * Boundary semantics match the old form: <2 words → empty array
    * (old: slice of length 0), null text → null.
    */
  private[graft] def bigrams(text: Column): Column = {
    val norm = Dedup.normalize(text)
    val sh = graft.expressions.WordShingles.word_shingles(norm, 2)
    // WordShingles returns [whole text] for 1-word input where the old
    // slice form returned []; mask that branch (single word ⇒ no space)
    when(text.isNull, lit(null).cast("array<string>"))
      .otherwise(when(contains(norm, lit(" ")), sh)
        .otherwise(array().cast("array<string>")))
  }

  /** Per-document repetition profile.
    *
    * Output: (id, n_words, uniq_word_frac, n_bigrams, top_bigram_cnt,
    * top_bigram_frac, repetitive). Documents with fewer than 2 words get
    * a zero bigram profile and are never flagged.
    *
    * Flag rule (Gopher-inspired): most-frequent bigram covers > maxTopFrac
    * of all bigrams, or unique-word fraction < minUniqFrac.
    */
  def profile(docs: DataFrame, idCol: String, textCol: String,
              maxTopFrac: Double = 0.2, minUniqFrac: Double = 0.3): DataFrame = {
    // NOTE: `docs` is scanned twice (per-row profile + bigram explode) —
    // deliberate: two column-pruned parquet scans are cheaper than
    // materializing the exploded bigram stream to share one scan.
    val perRow = docs.select(col(idCol),
      // empty/whitespace-only → 0 words (TextStats.tokenCount convention;
      // a bare split of "" yields one empty-string token = a phantom word)
      when(col(textCol).isNull || trim(col(textCol)) === "", 0)
        .otherwise(size(split(Dedup.normalize(col(textCol)), " "))).as("n_words"),
      round(uniqueWordFrac(col(textCol)), 6).as("uniq_word_frac"),
      bigrams(col(textCol)).as("__bg"))
    // mode-of-bigrams: explode → (id, gram) counts → per-id max. Both
    // aggregations partial-agg map-side; re-keying by id only is a
    // strictly coarser partitioning so AQE coalesces the second exchange.
    val top = perRow.select(col(idCol), explode(col("__bg")).as("__g"))
      .groupBy(col(idCol), col("__g")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol)).agg(
        max(col("__c")).as("top_bigram_cnt"),
        sum(col("__c")).as("n_bigrams"))
    perRow.drop("__bg")
      .join(top, Seq(idCol), "left")  // left: <2-word docs have no bigrams
      .select(col(idCol), col("n_words"), col("uniq_word_frac"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("top_bigram_cnt"), lit(0L)).as("top_bigram_cnt"),
        round(when(coalesce(col("n_bigrams"), lit(0L)) === 0, 0.0)
          .otherwise(col("top_bigram_cnt").cast("double") / col("n_bigrams")), 6)
          .as("top_bigram_frac"))
      .withColumn("repetitive",
        // <2-word (incl. empty) docs have no repetition signal — never
        // flagged here; a length filter is the right tool for those
        col("n_words") >= 2 &&
          (col("top_bigram_frac") > maxTopFrac || col("uniq_word_frac") < minUniqFrac))
  }
}
