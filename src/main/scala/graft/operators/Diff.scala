package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff — "what changed since yesterday's corpus": classify
  * every id as added / removed / changed / unchanged between two table
  * versions, comparing a content digest instead of the content itself.
  *
  * This is the audit face of incremental processing: the incremental
  * dedup path answers "which NEW rows survive", this answers "what
  * happened to the corpus", feeding retention review, cache
  * invalidation, and re-embedding queues (only `added`/`changed` rows
  * need re-encoding).
  *
  * Scale shape: each side is one narrow digest projection (md5 over the
  * concatenated compare columns with null sentinels), then ONE
  * full-outer hash join on the id — cost is id-keyed shuffle of
  * 16-byte digests, never of the content columns. No windows, no
  * global order.
  */
object Diff {

  /** md5 digest over `cols` with length-prefixed null-safe encoding:
    * `concat_ws` alone would confuse ("a", null) with ("a", "") and
    * ("ab","c") with ("a","bc"); prefixing each value with its length
    * and a null marker makes the encoding injective.
    */
  def digest(cols: Seq[Column]): Column =
    md5(concat(cols.flatMap(c => Seq(
      coalesce(length(c.cast("string")).cast("string"), lit("n")),
      lit(":"),
      coalesce(c.cast("string"), lit("")))): _*))

  /** Diff `newer` against `older` by `idCol`, comparing the digest of
    * `compareCols`. Output: `(idCol, status, old_digest, new_digest)`
    * with status ∈ added | removed | changed | unchanged.
    */
  def byDigest(older: DataFrame, newer: DataFrame, idCol: String,
               compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "compareCols must be non-empty")
    def side(df: DataFrame, tag: String) =
      df.select(col(idCol),
        digest(compareCols.map(col)).as(s"${tag}_digest"))
    side(older, "old")
      .join(side(newer, "new"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("old_digest").isNull, "added")
          .when(col("new_digest").isNull, "removed")
          .when(col("old_digest") === col("new_digest"), "unchanged")
          .otherwise("changed").as("status"),
        col("old_digest"), col("new_digest"))
  }

  /** Rollup of [[byDigest]]: one row per status with counts — the
    * number a daily pipeline logs and alerts on. */
  def summary(diff: DataFrame): DataFrame =
    diff.groupBy(col("status")).agg(count(lit(1)).as("n"))
}
