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
  *   - trim surgery is the [[graft.expressions.WordDropPositions]]
  *     kernel: one byte pass with hash-set position membership,
  *     O(tokens + covered) — never a per-token scan (quadratic on a
  *     fully-covered doc);
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
        // one O(len + |cov|) byte pass ([[graft.expressions.WordDropPositions]]):
        // hash-set membership, bytes copied once. The previous
        // transform-over-array_except form re-evaluated the whole
        // element_at(split(...)) tree per KEPT TOKEN inside the
        // interpreted lambda — O(tokens · text_len) per row. Guard
        // n_tokens = 0 (no words).
        when(col("n_tokens") === 0, lit("")).otherwise(
          graft.expressions.WordDropPositions.word_drop_positions(
            col("__norm"),
            coalesce(col("__cov"), array().cast("array<int>"))))
          .as("text_clean"))
  }

  // ---- canonical-occurrence (keep-first) tier ---------------------------
  //
  // [[dupSpanProfile]]/[[trimDupSpans]] implement the drop/cut-EVERY-copy
  // policy: a span duplicated across minDocs documents is removed from
  // ALL of them, so the corpus loses that text entirely. Lee et al.'s
  // actual ExactSubstr tool keeps ONE occurrence — the corpus retains a
  // single copy of every repeated passage and only the REDUNDANT copies
  // are cut. The tier below implements that policy, plus two semantics
  // the cross-doc tier cannot express:
  //   - WITHIN-document repeats count (a k-window repeated twice inside
  //     one document is a duplicate — generation loops, self-plagiarized
  //     boilerplate); occurrence counting is positional, not per-doc;
  //   - the canonical survivor is deterministic: the corpus-minimal
  //     (id, pos) occurrence of each window, totally ordered by the
  //     (id, pos) struct key (field-by-field numeric order — valid for
  //     any ids).

  /** Marked (redundant) window starts under the canonical-occurrence
    * policy: every `spanLen`-token window whose text occurs at `minOcc`+
    * positions corpus-wide, MINUS the single canonical occurrence per
    * distinct window when `keepFirst` (pass `keepFirst = false` for the
    * cut-every-copy composition). Output `(idCol, __pos)` — 0-based
    * window starts over the normalized token stream.
    *
    * Scale shape: the [[coveredPositions]] posting build verbatim
    * (chained-concat shingles, one posting row per token), then ONE
    * `(window-hash)` count+min aggregation with map-side partials and
    * one hash-keyed join back — both sides shuffle on the same key, so
    * the join is co-partitioned. Never all-pairs; no suffix array's
    * global sort (the reference construction is single-machine — every
    * duplicated substring of length ≥ spanLen is a union of duplicated
    * spanLen-windows, so window counting finds the same coverage).
    */
  private def markedStarts(base: DataFrame, idCol: String, spanLen: Int,
                           minOcc: Long, keepFirst: Boolean): DataFrame = {
    val posting = base.filter(col("n_tokens") >= spanLen)
      .select(col(idCol),
        posexplode(Dedup.shingles(col("__norm"), spanLen)).as(Seq("__pos", "__gram")))
      .select(col(idCol), col("__pos"), md5(col("__gram")).as("__g"))
      // canonical-occurrence key as a STRUCT: field-by-field ordering is
      // (id, pos) numeric order for ANY ids — replaces the zero-padded
      // "%020d|%010d" string render, which cost a format per posting row,
      // shuffled 31 chars instead of 12 bytes, and mis-ordered negative
      // ids (the old code guarded that with a per-row raise_error branch;
      // struct ordering makes the guard unnecessary)
      .withColumn("__key", struct(col(idCol).as("id"), col("__pos").as("pos")))
    val stats = posting.groupBy("__g")
      .agg(count(lit(1)).as("__n"), min(col("__key")).as("__first"))
      .filter(col("__n") >= minOcc)
    val m = posting.join(stats, Seq("__g"))
    (if (keepFirst) m.where(col("__key") =!= col("__first")) else m)
      .select(col(idCol), col("__pos"))
  }

  /** Redundant-substring SPANS per document: [[markedStarts]] merged
    * into maximal regions. Each marked window covers token positions
    * `[__pos, __pos+spanLen−1]`; overlapping or ADJACENT windows (a
    * duplicated passage longer than spanLen tokens is a run of adjacent
    * duplicated windows) merge into one span — the contiguous region a
    * pipeline cuts.
    *
    * Output: `(idCol, span_start, span_end, n_windows)` — 0-based
    * INCLUSIVE token coordinates over the normalized token stream (the
    * [[trimDupSpans]] position convention), `n_windows` the count of
    * marked windows merged into the span. Documents with no redundant
    * windows emit no rows.
    *
    * The merge is the classic running-max interval pass: one window
    * partitioned BY DOCUMENT (never global — parallelism is the doc
    * count, per-task state the doc's own marked-window list).
    */
  def canonicalDupSpans(df: DataFrame, idCol: String, textCol: String,
                        spanLen: Int = 8, minOcc: Long = 2L,
                        keepFirst: Boolean = true): DataFrame = {
    require(spanLen >= 2, s"spanLen must be >= 2, got $spanLen")
    require(minOcc >= 2L, s"minOcc must be >= 2, got $minOcc")
    val base = withTokens(df, idCol, textCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("__pos"))
    val prevEnd = max(col("__end")).over(w.rowsBetween(Long.MinValue, -1))
    val flagged = markedStarts(base, idCol, spanLen, minOcc, keepFirst)
      .withColumn("__end", col("__pos") + lit(spanLen - 1))
      .withColumn("__new",
        when(prevEnd.isNull || col("__pos") > prevEnd + lit(1), 1L)
          .otherwise(0L))
      .withColumn("__grp",
        sum(col("__new")).over(w.rowsBetween(Long.MinValue, 0)))
    flagged.groupBy(col(idCol), col("__grp"))
      .agg(min(col("__pos")).cast("long").as("span_start"),
        max(col("__end")).cast("long").as("span_end"),
        count(lit(1)).as("n_windows"))
      .select(col(idCol), col("span_start"), col("span_end"),
        col("n_windows"))
  }

  /** Keep-first trim: [[trimDupSpans]]'s surgery under the canonical-
    * occurrence policy — redundant copies cut, the corpus-first
    * occurrence of every repeated passage KEPT (and within-doc repeats
    * cut too). Output `(idCol, n_tokens, n_removed, text_clean)` with
    * the empty→`("", 0)` convention; `text_clean` is the normalized
    * text with covered tokens dropped (the [[trimDupSpans]] kernel
    * verbatim — [[graft.expressions.WordDropPositions]], one byte pass,
    * hash-based, never a per-token scan).
    */
  def trimDupSpansKeepFirst(df: DataFrame, idCol: String, textCol: String,
                            spanLen: Int = 8, minOcc: Long = 2L): DataFrame = {
    require(spanLen >= 2, s"spanLen must be >= 2, got $spanLen")
    require(minOcc >= 2L, s"minOcc must be >= 2, got $minOcc")
    val base = withTokens(df, idCol, textCol)
    val cov = markedStarts(base, idCol, spanLen, minOcc, keepFirst = true)
      .select(col(idCol),
        explode(sequence(col("__pos"), col("__pos") + lit(spanLen - 1))).as("__t"))
      .distinct()
      .groupBy(col(idCol)).agg(sort_array(collect_list(col("__t"))).as("__cov"))
    base.join(cov, Seq(idCol), "left")
      .select(col(idCol),
        col("n_tokens").cast("long").as("n_tokens"),
        coalesce(size(col("__cov")), lit(0)).cast("long").as("n_removed"),
        when(col("n_tokens") === 0, lit("")).otherwise(
          // same single-pass trim kernel as trimDupSpans
          graft.expressions.WordDropPositions.word_drop_positions(
            col("__norm"),
            coalesce(col("__cov"), array().cast("array<int>"))))
          .as("text_clean"))
  }
}
