package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** "Cập nhật N <unit> trước" → seconds (F8).
  *
  * Reference: `src/data_sources/topcv/parser.py:83-106` — strip the
  * "Cập nhật" prefix, take the first integer, pick the unit by substring:
  * tháng = 30 d, tuần = 7 d, ngày, giờ, phút; a bare number is seconds;
  * no number (or null/empty) → 0. The caller derives
  * `posted_time = now − seconds` (`parser.py:206-210`).
  */
object LastUpdate {

  def lastUpdateSeconds(c: Column): Column = {
    val t   = trim(regexp_replace(c.cast("string"), "Cập nhật", ""))
    val num = regexp_extract(t, "(\\d+)", 1)
    val n   = num.cast("long")
    when(c.isNull || c.cast("string") === "" || num === "", lit(0L))
      .when(t.contains("tháng"), n * 30 * 24 * 3600)
      .when(t.contains("tuần"), n * 7 * 24 * 3600)
      .when(t.contains("ngày"), n * 24 * 3600)
      .when(t.contains("giờ"), n * 3600)
      .when(t.contains("phút"), n * 60)
      .otherwise(n)
  }

  /** posted_time = now − lastUpdateSeconds (`parser.py:206-210`). */
  def postedTime(lastUpdateText: Column, now: Column): Column =
    (now.cast("long") - lastUpdateSeconds(lastUpdateText)).cast("timestamp")
}
