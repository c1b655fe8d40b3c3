package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generated date dimension (M4).
  *
  * Reference: `src/etl/warehouse/dimensions/date.py:15-77` — range spans
  * [min(observed posted/due/crawled dates), max(observed, runDate+5d)],
  * defaulting to [runDate−30d, runDate+5d] when no observations; attributes
  * per `sql/schemas/dwh_schema.sql:104-117`: day, month, quarter, year,
  * week_of_year (ISO), day_of_week (ISO, 1=Monday), weekday_name,
  * is_weekend (dow ≥ 6), 'YYYY-MM' year_month, 'Qn' quarter_name.
  *
  * Implemented as `sequence(min, max, 1 day)` + `explode` — a few thousand
  * rows generated without driver loops, all attributes from codegen'd
  * native date functions; never a bottleneck at any scale.
  */
object DimDate {

  /** Attribute projection over a single DATE column `date_id`. */
  def attributes(dateId: Column): Seq[Column] = {
    val isoDow = (weekday(dateId) + lit(1)).cast("long")
    Seq(
      dayofmonth(dateId).cast("long").as("day"),
      month(dateId).cast("long").as("month"),
      quarter(dateId).cast("long").as("quarter"),
      year(dateId).cast("long").as("year"),
      weekofyear(dateId).cast("long").as("week_of_year"),
      isoDow.as("day_of_week"),
      date_format(dateId, "EEEE").as("weekday_name"),
      (isoDow >= 6).as("is_weekend"),
      date_format(dateId, "yyyy-MM").as("year_month"),
      concat(lit("Q"), quarter(dateId)).as("quarter_name"))
  }

  /** Full dim rows for every date in [lo, hi] (one-row input df). */
  private def expand(bounds: DataFrame): DataFrame =
    bounds
      .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("date_id"))
      .select(col("date_id") +: attributes(col("date_id")): _*)

  /** Dense calendar spanning the min..max of `dateCol` in `df`. */
  def forSpan(df: DataFrame, dateCol: Column): DataFrame =
    expand(df.agg(min(dateCol.cast("date")).as("lo"), max(dateCol.cast("date")).as("hi")))

  /** Reference-complete range (`date.py:23-38`): observe every column in
    * `dateCols`; lo = min(observed) (default runDate−30d), hi =
    * max(max(observed), runDate+5d). Null observations ignored.
    */
  def forObserved(df: DataFrame, dateCols: Seq[Column], runDate: Column,
                  projectionDays: Int = 5): DataFrame = {
    val observed = dateCols.map(c =>
      df.select(c.cast("date").as("d")).filter(col("d").isNotNull))
      .reduce(_ unionByName _)
    val bounds = observed.agg(
      coalesce(min(col("d")), date_sub(runDate.cast("date"), 30)).as("lo"),
      greatest(coalesce(max(col("d")), runDate.cast("date")),
        date_add(runDate.cast("date"), projectionDays)).as("hi"))
    expand(bounds)
  }

  /** Insert-missing-dates-only semantics (`date.py:44-49`): generate the
    * span, anti-join what the dim already has, union with existing. */
  def mergeInto(existingDim: DataFrame, observed: DataFrame, dateCols: Seq[Column],
                runDate: Column): DataFrame = {
    val fresh = forObserved(observed, dateCols, runDate)
      .join(existingDim, Seq("date_id"), "left_anti")
    existingDim.unionByName(fresh)
  }
}
