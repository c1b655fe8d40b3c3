package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture apply: collapse an ordered change log
  * (insert / update / delete rows per business key) into the final
  * table state — the generalization of the reference's upsert merge
  * (`etl/load.py` upsert path) to feeds that also carry deletes, i.e.
  * what a Debezium/binlog extract looks like by the time it lands in
  * object storage.
  *
  * Semantics: last-writer-wins per key — the row with the greatest
  * `(tsCol, tieCols…)` decides; if its op is `deleteOp` the key is
  * absent from the output, otherwise the row's payload (op column
  * dropped) IS the final state. Ties must be broken totally by
  * `tieCols` or the survivor is nondeterministic (same contract as
  * the dedup windows).
  *
  * Scale shape: ONE key-partitioned window in the
  * rank-filtered-not-projected form, so `InferWindowGroupLimit` ships
  * at most one row per key from each map task (the same plan pin as
  * the k = 1 priority dedup) — the shuffle carries survivors, not the
  * full log. No join against the existing table is needed when the
  * log is complete; for incremental application against a snapshot,
  * union the snapshot in as older-than-everything inserts first.
  */
object Cdc {

  def applyChanges(log: DataFrame, keys: Seq[String], tsCol: String,
                   opCol: String, tieCols: Seq[String] = Nil,
                   deleteOp: String = "D"): DataFrame = {
    require(keys.nonEmpty, "applyChanges needs at least one key column")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((col(tsCol).desc +: tieCols.map(col(_).desc)): _*)
    log.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(opCol) =!= deleteOp)
      .drop("__rn", opCol)
  }
}
