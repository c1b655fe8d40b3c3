package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Test-set contamination detection — the decontamination primitive a
  * training-data pipeline runs before evaluation: find train documents
  * that CONTAIN an eval document's n-grams, where near-dup pair mining
  * (symmetric Jaccard) would miss a short eval doc swallowed by a long
  * train doc.
  *
  * Containment of eval e in train t over distinct word n-gram shingle
  * sets: `|S(t) ∩ S(e)| / |S(e)|` — 1.0 when every eval shingle appears
  * in the train doc (e.g. verbatim inclusion), asymmetric by design.
  *
  * Scale: an inverted-index equi-join on the shingle — work is bounded by
  * posting-list sizes, never |train| × |eval|. Both sides explode their
  * DISTINCT shingles, so the per-(train, eval) match count IS the
  * intersection size and aggregates with map-side partials. `maxPostings`
  * optionally drops shingles whose train posting list exceeds the cap
  * (boilerplate n-grams shared by a large corpus fraction): a skew guard
  * for degenerate corpora that can only LOWER a containment score —
  * documented approximation, off by default (exact).
  */
object Contamination {

  def detect(train: DataFrame, evalSet: DataFrame, idCol: String,
             textCol: String, threshold: Double, shingleN: Int = 3,
             maxPostings: Int = 0): DataFrame = {
    val t = train.select(col(idCol).as("train_id"),
      explode(Dedup.shinglesDistinct(col(textCol), shingleN)).as("__sh"))
    val posts =
      if (maxPostings > 0) {
        // partial-agg sizes + semi-join, same shape as the LSH bucket caps
        val keep = t.groupBy("__sh").agg(count(lit(1)).as("__df"))
          .filter(col("__df") <= maxPostings).select("__sh")
        t.join(keep, Seq("__sh"), "left_semi")
      } else t
    val e = evalSet.select(col(idCol).as("eval_id"),
        Dedup.shinglesDistinct(col(textCol), shingleN).as("__set"))
      .select(col("eval_id"), size(col("__set")).as("__esz"),
        explode(col("__set")).as("__sh"))
    posts.join(e, Seq("__sh"))
      .groupBy(col("train_id"), col("eval_id"), col("__esz"))
      .agg(count(lit(1)).as("__overlap"))
      .select(col("train_id"), col("eval_id"),
        (col("__overlap").cast("double") / col("__esz")).as("containment"))
      .filter(col("containment") >= threshold)
  }

  /** Per-train-document contamination VERDICT over [[detect]]'s pairs:
    * every train row comes back as `(idCol, n_eval_hits,
    * max_containment, keep)` — `keep` = touched no eval doc at the
    * threshold, `max_containment` null for clean docs. The report form
    * a pipeline logs before cutting (how MUCH is leaving, and how
    * badly contaminated the worst offender was).
    */
  def flag(train: DataFrame, evalSet: DataFrame, idCol: String,
           textCol: String, threshold: Double, shingleN: Int = 3,
           maxPostings: Int = 0): DataFrame = {
    val hits = detect(train, evalSet, idCol, textCol, threshold, shingleN,
        maxPostings)
      .groupBy(col("train_id"))
      .agg(count(lit(1)).as("n_eval_hits"),
        max(col("containment")).as("max_containment"))
      .withColumnRenamed("train_id", idCol)
    train.select(col(idCol)).join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_eval_hits"), lit(0L)).as("n_eval_hits"),
        col("max_containment"),
        col("n_eval_hits").isNull.as("keep"))
  }

  /** The CUT: train rows whose document contains NO eval doc at the
    * threshold — [[detect]]'s pairs applied as a left-anti join, the
    * decontamination step run right before a training corpus ships.
    * Only ids move through the anti-join; payload columns ride the
    * surviving train rows untouched.
    */
  def decontaminate(train: DataFrame, evalSet: DataFrame, idCol: String,
                    textCol: String, threshold: Double, shingleN: Int = 3,
                    maxPostings: Int = 0): DataFrame =
    train.join(
      detect(train, evalSet, idCol, textCol, threshold, shingleN,
          maxPostings)
        .select(col("train_id").as(idCol)).distinct(),
      Seq(idCol), "left_anti")
}
