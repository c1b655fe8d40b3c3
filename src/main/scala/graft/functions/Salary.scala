package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Salary normalization + deadline derivations (F3, F4, F5).
  *
  * Reference: `sql/procedures/staging_procedures.sql:8-84` (the 11-branch
  * normalize_salary ladder), `:141-145` (due_date), `:89-123`
  * (time_remaining). Fully native `when`/`regexp_extract` ladders — no UDF.
  *
  * Comma semantics preserved verbatim (SURVEY.md §7.5-6): USD branches
  * strip commas (thousands separators), triệu branches turn a comma into a
  * decimal point. USD rate hardcoded 25 000 like the reference.
  */
object Salary {

  private val Money = DecimalType(18, 2)
  val UsdRate = 25000

  private val RangeUsd = "(?iu)([0-9,.]+)\\s*-\\s*([0-9,.]+)\\s*usd"
  private val RangeTr  = "(?iu)([0-9,.]+)\\s*-\\s*([0-9,.]+)\\s*triệu"
  private val UptoUsd  = "(?iu)tới\\s+([0-9,.]+)\\s*usd"
  private val UptoTr   = "(?iu)tới\\s+([0-9,.]+)\\s*triệu"
  private val FromTr   = "(?iu)từ\\s+([0-9,.]+)\\s*triệu"
  private val OneUsd   = "(?iu)([0-9,.]+)\\s*usd"
  private val OneTr    = "(?iu)([0-9,.]+)\\s*triệu"

  /** USD figure: commas are thousands separators → drop them. */
  private def usdNum(m: Column): Column =
    regexp_replace(m, ",", "").cast(Money)

  /** triệu figure: comma is a decimal point → swap it. */
  private def trNum(m: Column): Column =
    regexp_replace(m, ",", ".").cast(Money)

  private def out(mn: Column, mx: Column, ty: String) = struct(
    mn.cast(Money).as("salary_min"),
    mx.cast(Money).as("salary_max"),
    lit(ty).as("salary_type"))

  private val NullMoney = lit(null).cast(Money)

  /** F3: `normalize_salary(text)` →
    * `struct(salary_min, salary_max, salary_type)`.
    */
  def normalizeSalary(c: Column): Column = {
    val t  = c.cast("string")
    val lo = lower(t)
    when(t.isNull || t === "" || lo.rlike("thoả thuận|thỏa thuận|thương lượng"),
        out(NullMoney, NullMoney, "negotiable"))
      .when(lo.rlike("cạnh tranh"), out(NullMoney, NullMoney, "competitive"))
      .when(t === "0.0 - 0.0 triệu", out(NullMoney, NullMoney, "negotiable"))
      .when(t.rlike(RangeUsd), out(
        usdNum(regexp_extract(t, RangeUsd, 1)) * UsdRate,
        usdNum(regexp_extract(t, RangeUsd, 2)) * UsdRate, "range"))
      .when(t.rlike(RangeTr), out(
        trNum(regexp_extract(t, RangeTr, 1)) * 1000000,
        trNum(regexp_extract(t, RangeTr, 2)) * 1000000, "range"))
      .when(t.rlike(UptoUsd), out(
        NullMoney, usdNum(regexp_extract(t, UptoUsd, 1)) * UsdRate, "upto"))
      .when(t.rlike(UptoTr), out(
        NullMoney, trNum(regexp_extract(t, UptoTr, 1)) * 1000000, "upto"))
      .when(t.rlike(FromTr), out(
        trNum(regexp_extract(t, FromTr, 1)) * 1000000, NullMoney, "from"))
      .when(t.rlike(OneUsd) && !t.contains("-"), out(
        usdNum(regexp_extract(t, OneUsd, 1)) * UsdRate,
        usdNum(regexp_extract(t, OneUsd, 1)) * UsdRate, "range"))
      .when(t.rlike(OneTr) && !t.contains("-"), out(
        trNum(regexp_extract(t, OneTr, 1)) * 1000000,
        trNum(regexp_extract(t, OneTr, 1)) * 1000000, "range"))
      .otherwise(out(NullMoney, NullMoney, "unknown"))
  }

  /** F4: due_date = crawled_at + deadline days, only when `deadline` is all
    * digits (`staging_procedures.sql:141-145`). Day arithmetic in epoch
    * seconds — exact in a UTC session (no DST).
    */
  def dueDate(crawledAt: Column, deadline: Column): Column =
    when(deadline.rlike("^\\d+$"),
      (epochSecs(crawledAt) + deadline.cast("long") * 86400L).cast("timestamp"))
    .otherwise(lit(null).cast("timestamp"))

  /** Epoch seconds for either TIMESTAMP or TIMESTAMP_NTZ input (NTZ cannot
    * cast to long directly; via LTZ it's the identity in a UTC session).
    */
  private def epochSecs(c: Column): Column = c.cast("timestamp").cast("long")

  /** F5: tiered Vietnamese countdown (`staging_procedures.sql:89-123`).
    * `now` is an explicit column for determinism (SURVEY.md §7.5-1).
    * Sub-second divergence: the seconds tier truncates whole seconds where
    * PG's `EXTRACT(second)::int` would round the fraction — observable
    * only when `due_date` carries sub-second precision, which staged data
    * never does.
    */
  def timeRemaining(dueDate: Column, now: Column): Column = {
    val secs = epochSecs(dueDate) - epochSecs(now)
    def msg(n: Column, unit: String): Column =
      concat(lit("Còn "), n.cast("long"), lit(s" $unit để ứng tuyển"))
    when(dueDate.isNull, lit(null).cast("string"))
      .when(secs <= 0, lit("Đã hết thời gian ứng tuyển"))
      .when(secs >= 86400, msg(floor(secs / 86400), "ngày"))
      .when(secs >= 3600, msg(floor(secs / 3600), "giờ"))
      .when(secs >= 60, msg(floor(secs / 60), "phút"))
      .otherwise(msg(secs, "giây"))
  }
}
