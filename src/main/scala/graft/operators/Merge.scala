package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Set-level upsert (MERGE) over immutable Parquet tables.
  *
  * Re-expresses the reference's row-at-a-time `INSERT … ON CONFLICT DO
  * UPDATE` (`src/storage/postgres.py:34-104`): an incoming row replaces the
  * existing row for the same key ONLY if any tracked column differs
  * (`IS DISTINCT FROM` over the update columns, `postgres.py:67-80`);
  * otherwise the existing row is kept untouched. Each output row is
  * classified inserted / updated / unchanged, matching the reference's
  * `xmax = 0` classification (`postgres.py:86-96`).
  *
  * Scale: one full-outer join shuffled on the key; with both sides bucketed
  * or pre-partitioned on the key this is a co-located join with no extra
  * exchange. The rewrite-the-table pattern replaces in-place mutation,
  * which Parquet does not support (SURVEY.md §2.1 S5).
  */
object Merge {

  val ClassCol = "merge_class"

  /** @param tracked columns whose change triggers replacement; compared
    *                null-safely like `IS DISTINCT FROM`. */
  def upsert(existing: DataFrame, incoming: DataFrame,
             key: Seq[String], tracked: Seq[String]): DataFrame = {
    val attrs = existing.columns.toSeq.filterNot(key.contains)
    val inc   = incoming.dropDuplicates(key)
    val j = existing.as("ex").join(inc.as("in"),
      key.map(k => col(s"ex.$k") === col(s"in.$k")).reduce(_ && _), "full_outer")

    val hasEx = col(s"ex.${key.head}").isNotNull
    val hasIn = col(s"in.${key.head}").isNotNull
    val differs = tracked.map(c => !(col(s"ex.$c") <=> col(s"in.$c"))).reduce(_ || _)

    val takeIncoming = !hasEx || differs
    val keyCols  = key.map(k => coalesce(col(s"in.$k"), col(s"ex.$k")).as(k))
    val attrCols = attrs.map(c =>
      when(hasIn && takeIncoming, col(s"in.$c")).otherwise(col(s"ex.$c")).as(c))
    // The reference's inserted/updated/unchanged stats count only rows
    // present in the incoming batch (`postgres.py:86-96`); existing rows
    // the batch never touched are a separate class so stats drawn from
    // `merge_class` match the reference exactly.
    val cls = when(!hasEx, lit("inserted"))
      .when(hasIn && differs, lit("updated"))
      .when(hasIn, lit("unchanged"))
      .otherwise(lit("untouched")).as(ClassCol)

    j.select(keyCols ++ attrCols :+ cls: _*)
  }

  /** Retention delete (S11): drop rows already archived — a null-safe
    * anti-join, replacing the reference's batched `DELETE WHERE id IN (…)`
    * (`src/storage/archive.py:164-208`). */
  def deleteByKeys(table: DataFrame, archivedKeys: DataFrame, key: Seq[String]): DataFrame =
    table.join(archivedKeys.select(key.map(col): _*).distinct(), key, "left_anti")
}
