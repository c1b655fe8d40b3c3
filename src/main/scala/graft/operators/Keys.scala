package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Surrogate-key assignment (W2).
  *
  * The reference uses DuckDB sequences (`sql/schemas/dwh_schema.sql:36-40`)
  * — gapless, monotonically increasing, persistent across runs. On Spark we
  * reproduce that contract as `max(existing sk) + row_number() OVER (ORDER
  * BY business key)`: deterministic on retry (unlike
  * `monotonically_increasing_id`), gapless, and stable given the same batch
  * (SURVEY.md §7.5-2).
  *
  * Scale note: a global `row_number` funnels the NEW keys through a single
  * partition. That is correct here because SK assignment only ever runs on
  * the *novel* keys of a batch (dimension deltas — thousands of rows, not
  * the fact volume). For bulk backfills use [[assignDistributed]], which
  * computes contiguous ids from per-partition counts without a single-task
  * sort.
  */
object Keys {

  /** Assign `offset + 1 … offset + n` to `newKeys` ordered by `orderBy`. */
  def assign(newKeys: DataFrame, orderBy: Seq[String], skCol: String, offset: Long): DataFrame = {
    val w = Window.orderBy(orderBy.map(col): _*)
    newKeys.withColumn(skCol, (lit(offset) + row_number().over(w)).cast("long"))
  }

  /** Contiguous ids without a global sort: zipWithIndex over the RDD
    * preserves partition order and computes per-partition offsets from
    * counts — one extra job, no shuffle, no single-task bottleneck.
    * Ordering is partition-order (not business-key order), so use this for
    * bulk loads where determinism comes from sorting beforehand.
    */
  def assignDistributed(newKeys: DataFrame, skCol: String, offset: Long): DataFrame = {
    val spark = newKeys.sparkSession
    val schema = org.apache.spark.sql.types.StructType(
      newKeys.schema.fields :+
        org.apache.spark.sql.types.StructField(skCol, org.apache.spark.sql.types.LongType, false))
    val rows = newKeys.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (offset + i + 1))
    }
    spark.createDataFrame(rows, schema)
  }

  /** Current max SK (0 for an empty dim) — the `NEXTVAL` starting point. */
  def maxSk(dim: DataFrame, skCol: String): Long =
    dim.agg(coalesce(max(col(skCol)), lit(0L))).head().getLong(0)
}
