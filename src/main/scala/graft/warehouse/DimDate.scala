package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generated date dimension (M4).
  *
  * Reference: `src/etl/warehouse/dimensions/date.py:15-77` — range spans
  * [min(observed dates), max(observed dates, today+5d)], default
  * [today−30d, today+5d]; attributes: day, month, quarter, year, ISO week,
  * ISO day-of-week (1=Monday), weekday name, is_weekend (dow ≥ 6),
  * 'YYYY-MM' month string, 'Qn' quarter string.
  *
  * Implemented as `sequence(min, max, 1 day)` + `explode` — a few thousand
  * rows generated driver-free, all attributes from codegen'd native date
  * functions; never a bottleneck at any scale.
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
      weekofyear(dateId).cast("long").as("iso_week"),
      isoDow.as("iso_dow"),
      date_format(dateId, "EEEE").as("day_name"),
      (isoDow >= 6).as("is_weekend"),
      date_format(dateId, "yyyy-MM").as("month_str"),
      concat(lit("Q"), quarter(dateId)).as("quarter_str"))
  }

  /** Dense calendar spanning the min..max of `dateCol` in `df`. */
  def forSpan(df: DataFrame, dateCol: Column): DataFrame = {
    val d = df.agg(min(dateCol.cast("date")).as("lo"), max(dateCol.cast("date")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("date_id"))
    d.select(col("date_id") +: attributes(col("date_id")): _*)
  }

  /** Insert-missing-dates-only semantics (`date.py:44-49`): generate the
    * span, anti-join what the dim already has. */
  def missingDates(existingDim: DataFrame, observed: DataFrame, dateCol: Column): DataFrame =
    forSpan(observed, dateCol).join(existingDim, Seq("date_id"), "left_anti")
}
