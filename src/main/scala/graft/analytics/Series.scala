package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-time-series repair over keyed daily data: densify each key's
  * observed span onto a complete day spine and forward-fill the value
  * columns — the step that turns an event-driven log ("rows only on
  * days something happened") into the gapless series every downstream
  * rolling metric, forecast feature, or day-over-day diff assumes.
  *
  * Scale shape: the spine is generated per key from that key's own
  * (min, max) day — `explode(sequence(...))` is a narrow generate after
  * one per-key partial aggregation, never a driver loop or a global
  * calendar cross join. The forward fill is `last(ignoreNulls)` over a
  * key-partitioned window — one shuffle by key, no unpartitioned
  * WindowExec. Per-key work is bounded by the key's span in days, so a
  * decade-long key costs ~3.7k rows regardless of corpus size.
  *
  * Carried-forward rows are marked `is_observed = false`; values before
  * a key's first observation stay null (nothing to carry). Each value
  * column keeps its own last-seen value independently (a day observing
  * only column A still carries column B forward).
  *
  * CONTRACT: `df` holds at most one row per (keys, day) — pre-aggregate
  * an event log first, or the spine join multiplies rows.
  */
object Series {

  def gapFillDaily(df: DataFrame, keys: Seq[String], dateCol: String,
                   valueCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "gapFillDaily needs at least one key column")
    require(valueCols.nonEmpty, "gapFillDaily needs at least one value column")
    val day = col(dateCol).cast("date")
    val spine = df.groupBy(keys.map(col): _*)
      .agg(min(day).as("__lo"), max(day).as("__hi"))
      .select(keys.map(col) :+
        explode(sequence(col("__lo"), col("__hi"))).as(dateCol): _*)
    val observed = df.select((keys.map(col) :+ day.as(dateCol)) ++
      valueCols.map(col) :+ lit(true).as("is_observed"): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(dateCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = spine.join(observed, keys :+ dateCol, "left")
    valueCols.foldLeft(joined) { (acc, v) =>
        acc.withColumn(v, last(col(v), ignoreNulls = true).over(w))
      }
      .withColumn("is_observed", coalesce(col("is_observed"), lit(false)))
  }
}
