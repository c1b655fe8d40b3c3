package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

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
    // a null op on the winning row is a contract violation: the =!=
    // filter would otherwise null out and silently DELETE the key
    // (while the streaming form would upsert it — parity broken two
    // ways). Fail loudly instead, same convention as hashSplit.
    log.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .filter(when(col(opCol).isNull, raise_error(lit(
          s"applyChanges: null $opCol on a winning row — malformed feed")))
        .otherwise(col(opCol) =!= deleteOp))
      .drop("__rn", opCol)
  }

  /** Streaming form of [[applyChanges]]: consume a CDC feed with
    * `flatMapGroupsWithState` and emit a CHANGELOG of the materialized
    * view — one row per key per micro-batch in which that key's winner
    * changed, carrying the payload plus a `_change` column
    * (`upsert` | `delete`). Downstream sinks apply it idempotently
    * (last `_change` per key wins), so replays are safe.
    *
    * Out-of-order safety: state keeps the winning change INCLUDING
    * deletes (a tombstone must out-rank a late update that precedes
    * it), so a stale row arriving after a newer one emits nothing.
    * State is one row per live key — the materialized view itself, the
    * floor for any exactly-merged CDC consumer; keys never expire here
    * (a snapshot-and-restart compacts, same as any changelog consumer).
    *
    * Schema-generic: runs on any frame via `Encoders.row`, identical
    * code path for batch frames (Spark executes the same operator with
    * transient per-group state), which is what the batch-parity spec
    * pins: streamed changelog, folded, equals [[applyChanges]].
    *
    * `emitRetractions = true` switches to VIEW-DELTA form for
    * aggregate consumers ([[IncrementalAgg.applyChangelog]]): when a
    * key's winner changes, first `retract` the displaced live row
    * (so a downstream sum/count can subtract it), then `upsert` the
    * new one; a winning tombstone emits only the retraction. Stale
    * rows still emit nothing in either mode.
    */
  def applyChangesStream(log: DataFrame, keys: Seq[String], tsCol: String,
                         opCol: String, tieCols: Seq[String] = Nil,
                         deleteOp: String = "D",
                         emitRetractions: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "applyChangesStream needs at least one key column")
    val schema = log.schema
    val keyIdx = keys.map(schema.fieldIndex)
    val ordIdx = ((tsCol +: tieCols).map(schema.fieldIndex)).toArray
    val opIdx = schema.fieldIndex(opCol)
    val outIdx = schema.fields.indices.filterNot(_ == opIdx).toArray
    val outSchema = StructType(
      schema.fields.filterNot(_.name == opCol) :+
        StructField("_change", StringType, nullable = false))

    // total order on (ts, ties): nulls first, natural Comparable after
    def newer(a: Row, b: Row): Boolean = {
      var i = 0
      while (i < ordIdx.length) {
        val x = a.get(ordIdx(i)); val y = b.get(ordIdx(i))
        val c =
          if (x == null && y == null) 0
          else if (x == null) -1
          else if (y == null) 1
          else x.asInstanceOf[Comparable[Any]].compareTo(y)
        if (c != 0) return c > 0
        i += 1
      }
      false
    }

    // null op on a winner = malformed feed, same loud contract as the
    // batch form (which raise_errors) — anything else diverges parity
    def isDelete(r: Row) = {
      val op = r.get(opIdx)
      if (op == null) throw new IllegalArgumentException(
        s"applyChangesStream: null $opCol on a winning row — malformed feed")
      String.valueOf(op) == deleteOp
    }
    def out(r: Row, change: String): Row =
      Row.fromSeq(outIdx.toIndexedSeq.map(r.get) :+ change)
    // collision-proof group key: nulls get their own tag (a null key
    // and the string "null" must not share state) and string parts are
    // length-prefixed (a separator byte inside a value cannot fake a boundary)
    def groupKey(r: Row): String = keyIdx.map { i =>
      val v = r.get(i)
      if (v == null) "\u0001" else { val s = String.valueOf(v); s"${s.length}#$s" }
    }.mkString("\u0000")
    val fold = (_: String, rows: Iterator[Row], state: GroupState[Row]) => {
      val prev = state.getOption.orNull
      var best = prev
      rows.foreach { r => if (best == null || newer(r, best)) best = r }
      if (best eq prev) Iterator.empty
      else {
        state.update(best)
        if (!emitRetractions) {
          Iterator(out(best, if (isDelete(best)) "delete" else "upsert"))
        } else {
          // view-delta form: retract the DISPLACED live row (so an
          // aggregate consumer can subtract it), then assert the new one
          val retract =
            if (prev != null && !isDelete(prev)) Iterator(out(prev, "retract"))
            else Iterator.empty
          val assert_ =
            if (isDelete(best)) Iterator.empty
            else Iterator(out(best, "upsert"))
          (retract ++ assert_).toVector.iterator
        }
      }
    }
    log
      .groupByKey(groupKey _)(Encoders.STRING)
      .flatMapGroupsWithState[Row, Row](
          OutputMode.Update, GroupStateTimeout.NoTimeout)(fold)(
        Encoders.row(schema), Encoders.row(outSchema))
  }
}
