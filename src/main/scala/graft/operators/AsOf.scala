package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left row, the single most recent right
  * row with the same key whose timestamp is at-or-before (`strict =
  * false`, the default) or strictly-before (`strict = true`) the left
  * row's timestamp — the point-in-time lookup underneath "price at trade
  * time", "latest sensor reading", "config active when the event fired".
  * Left rows with no admissible right row keep null payloads (LEFT
  * semantics), so no input is silently dropped.
  *
  * Spark has no native as-of operator; the naive encodings are a
  * non-equi theta join (quadratic per key) or a per-key `collect` loop
  * (driver-bound). This implementation is the union-marker form instead:
  * tag right rows as quotes and left rows as probes, union them into one
  * stream, and take `last(quote, ignoreNulls)` over a window PARTITIONED
  * BY key ORDERED BY (ts, side) — at equal timestamps the side marker
  * decides whether the quote is admissible, which is how inclusive vs
  * strict is selected without a second pass.
  *
  * Scale shape: exactly ONE shuffle of each side (hash by key) plus a
  * per-partition sort by ts — the same work a native sort-merge as-of
  * does, with no row-by-row probing and no driver state. The window is
  * always key-partitioned (never global), so the plan-audit guard against
  * unpartitioned WindowExec holds. A pathologically hot key concentrates
  * its full history in one task — the same bound as any per-key ordered
  * computation; split the key's time range upstream if that ever binds.
  *
  * CONTRACT: `right` must be unique per (keys, rightTs) — with two
  * quotes on the same instant, "the most recent" is ill-defined and the
  * survivor would be partition-order-dependent. Collapse duplicates
  * upstream (e.g. keep max) where the source can produce them. Null
  * timestamps sort first: a null-ts left row matches nothing, a null-ts
  * right row is never matched.
  *
  * `tolerance` bounds the lookback: a match older than `leftTs -
  * tolerance` is nulled out (e.g. `expr("INTERVAL 1 HOUR")` for
  * timestamps, a plain literal for numeric time axes).
  */
object AsOf {

  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String, payload: Seq[String],
           matchedTsCol: String = "asof_ts",
           strict: Boolean = false,
           tolerance: Option[Column] = None): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equality key")
    require(payload.nonEmpty, "payload must name at least one right column")
    val taken = left.columns.toSet
    val clash = (matchedTsCol +: payload).filter(taken)
    require(clash.isEmpty,
      s"output columns ${clash.mkString(", ")} collide with left columns — rename")

    val tsType = left.schema(leftTs).dataType
    val lSide = if (strict) 0 else 1 // ties: quote admissible iff it sorts first
    val rightU = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).cast(tsType).as("__ts"),
        lit(1 - lSide).as("__side"),
        struct(col(rightTs).cast(tsType).as("__m") +: payload.map(col): _*)
          .as("__q")) ++
        left.columns.filterNot(keys.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val qType = rightU.schema("__q").dataType
    val leftU = left.select(
      left.columns.toIndexedSeq.map(col) ++ Seq(
        col(leftTs).cast(tsType).as("__ts"),
        lit(lSide).as("__side"),
        lit(null).cast(qType).as("__q")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val m0 = last(col("__q"), ignoreNulls = true).over(w)
    val matched = tolerance match {
      case Some(tol) => when(m0.getField("__m") >= col("__ts") - tol, m0)
      case None      => m0
    }
    leftU.unionByName(rightU)
      .withColumn("__matched", matched)
      .filter(col("__side") === lSide)
      .select(left.columns.toIndexedSeq.map(col) ++
        (col("__matched.__m").as(matchedTsCol) +:
          payload.map(p => col(s"__matched.$p").as(p))): _*)
  }
}
