package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Branch-by-branch goldens for the 11-branch normalize_salary ladder
  * (`sql/procedures/staging_procedures.sql:8-84`), due_date (`:141-145`)
  * and time_remaining (`:89-123`).
  */
class SalarySpec extends SparkSpec {

  private def norm(s: String): (Option[BigDecimal], Option[BigDecimal], String) = {
    val r = evalStr(Salary.normalizeSalary, s).asInstanceOf[Row]
    def d(i: Int) = if (r.isNullAt(i)) None else Some(BigDecimal(r.getDecimal(i)))
    (d(0), d(1), r.getString(2))
  }
  private def vnd(x: Long) = Some(BigDecimal(x).setScale(2))

  test("branch 1: null/empty/negotiable") {
    assert(norm(null) == (None, None, "negotiable"))
    assert(norm("") == (None, None, "negotiable"))
    assert(norm("Thoả thuận") == (None, None, "negotiable"))
    assert(norm("Thỏa thuận") == (None, None, "negotiable"))
    assert(norm("lương thương lượng") == (None, None, "negotiable"))
  }
  test("branch 2: competitive") {
    assert(norm("Cạnh tranh") == (None, None, "competitive"))
  }
  test("branch 3: literal 0.0 - 0.0 triệu") {
    assert(norm("0.0 - 0.0 triệu") == (None, None, "negotiable"))
  }
  test("branch 4: range USD ×25000, commas stripped") {
    assert(norm("1,000 - 2,000 USD") == (vnd(25000000L), vnd(50000000L), "range"))
    assert(norm("500-1000 usd") == (vnd(12500000L), vnd(25000000L), "range"))
  }
  test("branch 5: range triệu ×1e6, comma→decimal point") {
    assert(norm("25 - 40 triệu") == (vnd(25000000L), vnd(40000000L), "range"))
    assert(norm("7,5 - 12,5 Triệu") ==
      (Some(BigDecimal("7500000.00")), Some(BigDecimal("12500000.00")), "range"))
  }
  test("branch 6: upto USD") {
    assert(norm("Tới 3,000 USD") == (None, vnd(75000000L), "upto"))
  }
  test("branch 7: upto triệu") {
    assert(norm("tới 30 triệu") == (None, vnd(30000000L), "upto"))
  }
  test("branch 8: from triệu") {
    assert(norm("Từ 15 triệu") == (vnd(15000000L), None, "from"))
  }
  test("branch 9: single USD (no dash)") {
    assert(norm("2000 USD") == (vnd(50000000L), vnd(50000000L), "range"))
  }
  test("branch 10: single triệu (no dash)") {
    assert(norm("20 triệu") == (vnd(20000000L), vnd(20000000L), "range"))
  }
  test("branch 11: unknown") {
    assert(norm("liên hệ HR") == (None, None, "unknown"))
  }
  test("dash present forces range branches over single-value") {
    // "tới 30 triệu" has no dash; a dashed string must not hit branch 9/10
    assert(norm("30 - abc USD")._3 == "unknown") // malformed range: no branch matches
  }

  test("due_date: all-digit deadline adds days to crawled_at") {
    import spark.implicits._
    val df = Seq(("2026-01-15 06:00:00", "10"), ("2026-01-15 06:00:00", "31/01/2026"))
      .toDF("crawled", "deadline")
    val got = df.select(Salary.dueDate(col("crawled").cast("timestamp"), col("deadline"))
      .cast("string").as("d")).collect().map(r => Option(r.getString(0)))
    assert(got(0).contains("2026-01-25 06:00:00"))
    assert(got(1).isEmpty) // non-digit deadline → null
  }

  test("time_remaining tiers") {
    import spark.implicits._
    val now = lit("2026-01-15 00:00:00").cast("timestamp")
    val cases = Seq(
      "2026-01-20 12:00:00",  // 5.5 days
      "2026-01-15 05:00:00",  // 5 hours
      "2026-01-15 00:45:00",  // 45 minutes
      "2026-01-15 00:00:30",  // 30 seconds
      "2026-01-10 00:00:00")  // past
    val df = cases.toDF("due")
    val got = df.select(Salary.timeRemaining(col("due").cast("timestamp"), now).as("t"))
      .collect().map(_.getString(0))
    assert(got(0) == "Còn 5 ngày để ứng tuyển")
    assert(got(1) == "Còn 5 giờ để ứng tuyển")
    assert(got(2) == "Còn 45 phút để ứng tuyển")
    assert(got(3) == "Còn 30 giây để ứng tuyển")
    assert(got(4) == "Đã hết thời gian ứng tuyển")
  }
}
