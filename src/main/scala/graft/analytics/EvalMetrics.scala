package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier evaluation over predicted-vs-true label pairs — the
  * feedback half of the curation loop: a pipeline that filters with a
  * classifier ([[graft.llm.Classify]]) needs to MEASURE that classifier
  * on a held-out slice before trusting it with a corpus. Confusion
  * matrix, one-vs-rest precision/recall/F1, and rank-based ROC-AUC —
  * each a handful of aggregations whose published numbers are exact
  * integer counts or SINGLE exactly-rounded divisions of exact values,
  * so the `classify_confusion` / `classify_report` / `eval_auc` gates
  * hash-match their DuckDB restatements bitwise.
  *
  * Scale shape: everything is groupBy/agg with map-side partials over
  * the scored table; the only window ([[aucBinary]]) runs over DISTINCT
  * scores, which for round-6 scores in [−1, 1] is ≤ 4·10⁶ + 1 rows no
  * matter how large the corpus — a bounded frame, not a global sort of
  * the data.
  */
object EvalMetrics {

  /** Confusion matrix: `(truth, pred, n)` — one row per observed
    * (true label, predicted label) pair.
    */
  def confusionMatrix(df: DataFrame, truthCol: String, predCol: String): DataFrame =
    df.groupBy(col(truthCol).as("truth"), col(predCol).as("pred"))
      .agg(count(lit(1)).as("n"))

  /** One-vs-rest per-class report:
    * `(label, n_true, n_pred, tp, precision, recall, f1)`.
    *
    * Every ratio is ONE division of exact longs: precision = tp/n_pred,
    * recall = tp/n_true, and F1 collapses algebraically to
    * `2·tp / (n_true + n_pred)` (since fp + fn + 2·tp = n_true +
    * n_pred) — no compounding of rounded intermediates, hence portable.
    * A class never predicted gets null precision (not 0/0), a class
    * never true gets null recall; F1's denominator is positive for any
    * class that appears at all.
    */
  def classReport(df: DataFrame, truthCol: String, predCol: String): DataFrame = {
    val t = df.groupBy(col(truthCol).as("label"))
      .agg(count(lit(1)).as("n_true"))
    val p = df.groupBy(col(predCol).as("label"))
      .agg(count(lit(1)).as("n_pred"))
    val tp = df.filter(col(truthCol) === col(predCol))
      .groupBy(col(truthCol).as("label")).agg(count(lit(1)).as("tp"))
    t.join(p, Seq("label"), "full").join(tp, Seq("label"), "left")
      .select(col("label"),
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("tp"), lit(0L)).as("tp"))
      .select(col("*"),
        when(col("n_pred") === 0, lit(null).cast("double"))
          .otherwise(col("tp").cast("double") / col("n_pred").cast("double"))
          .as("precision"),
        when(col("n_true") === 0, lit(null).cast("double"))
          .otherwise(col("tp").cast("double") / col("n_true").cast("double"))
          .as("recall"),
        ((lit(2L) * col("tp")).cast("double") /
          (col("n_true") + col("n_pred")).cast("double")).as("f1"))
  }

  /** Reliability diagram (calibration curve): scores bucketed into
    * `bins` equal-width bins over `[lo, hi]`; per bin the row count,
    * positive count, positive fraction (one exact division) and the
    * exact-decimal mean score — "when the scorer says 0.8, how often is
    * it right?", the check that decides whether a classifier's scores
    * can gate a corpus at a THRESHOLD rather than just rank it (AUC
    * only certifies ranking). Bin edges are plain IEEE arithmetic on
    * bitwise-equal operands; out-of-range scores clamp into the end
    * bins rather than dropping.
    */
  def calibration(df: DataFrame, scoreCol: String, labelCol: String,
                  bins: Int = 10, lo: Double = -1.0, hi: Double = 1.0): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    require(lo < hi, s"need lo < hi, got [$lo, $hi]")
    val pos = col(labelCol).cast("boolean")
    val bin = least(greatest(
      floor((col(scoreCol) - lo) / (hi - lo) * bins), lit(0.0)),
      lit((bins - 1).toDouble)).cast("int")
    df.groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(pos, 1L).otherwise(0L)).as("n_pos"),
        sum(col(scoreCol).cast("decimal(28,15)")).as("__s"))
      .select(col("bin"), col("n"), col("n_pos"),
        (col("n_pos").cast("double") / col("n").cast("double")).as("frac_pos"),
        (col("__s").cast("double") / col("n").cast("double")).as("mean_score"))
  }

  /** Binary ROC-AUC by the tie-averaged rank statistic (Mann–Whitney):
    * one row `(n_pos, n_neg, auc)`.
    *
    * Computed as `Σ_s p_s·(N_{<s} + n_s/2) / (P·N)` over distinct
    * scores ascending — algebraically identical to the average-rank
    * formula, including ties. Each contribution is a HALF-INTEGER
    * (p·cum + p·n/2), and half-integers sum EXACTLY in double up to
    * 2⁵², so the sum is order-independent and any engine reproduces
    * the published value bit-for-bit; the final AUC is one division.
    *
    * The window orders DISTINCT scores, not rows — with round-6 scores
    * the frame is bounded by the score lattice (≤ 4·10⁶ + 1 values in
    * [−1, 1]) regardless of corpus size. Degenerate inputs (no
    * positives or no negatives) yield a null AUC rather than 0/0.
    */
  def aucBinary(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val pos = col(labelCol).cast("boolean")
    val g = df.groupBy(col(scoreCol).as("__s"))
      .agg(sum(when(pos, 1L).otherwise(0L)).as("__p"),
        sum(when(pos, 0L).otherwise(1L)).as("__n"))
    val w = Window.orderBy(col("__s").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val contrib = g.select(col("__p"), col("__n"),
      (col("__p").cast("double") *
        (coalesce(sum(col("__n")).over(w), lit(0L)).cast("double") +
          col("__n").cast("double") / 2.0)).as("__c"))
    contrib.agg(
        sum(col("__p")).cast("long").as("n_pos"),
        sum(col("__n")).cast("long").as("n_neg"),
        sum(col("__c")).as("__sc"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") === 0 || col("n_neg") === 0,
            lit(null).cast("double"))
          .otherwise(col("__sc") /
            (col("n_pos").cast("double") * col("n_neg").cast("double")))
          .as("auc"))
  }
}
