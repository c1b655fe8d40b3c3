package graft.ingest

import graft.SparkSpec
import graft.quality.{QualityGate, ValidationHardFailError, Validators}
import org.apache.spark.sql.functions._

/** Parser tests against reference card shapes (FIXTURES.md §1,
  * `parser_config.py` primary selectors) and validator/gate tests ported
  * from `tests/unit/test_validators.py`.
  */
class IngestQualitySpec extends SparkSpec {
  import spark.implicits._

  private val card =
    """<div class="job-item-2" data-job-id="2008076">
      |  <a href="/company/fpt"><img src="https://cdn.topcv.vn/logo.png"></a>
      |  <h3 class="title"><a href="/viec-lam/senior-python-developer-2008076.html">
      |    <span data-original-title="Senior Python Developer">Senior Python…</span></a></h3>
      |  <a class="company" href="/cong-ty/fpt-software">FPT Software</a>
      |  <label class="address">Hà Nội &amp; Hồ Chí Minh</label>
      |  <label class="title-salary">25 - 40 triệu</label>
      |  <div class="skills"><label class="item">Python</label>
      |    <label class="item">Django</label>
      |    <label class="item" data-original-title="PostgreSQL, Redis">2+</label></div>
      |  <label class="time"><strong>23</strong></label>
      |  <span class="vip-badge"></span>
      |  <label class="deadline">Cập nhật 3 ngày trước</label>
      |</div>""".stripMargin

  test("extractJob: all 12 fields from a full card") {
    val j = HtmlParser.extractJob(card).get
    assert(j.job_id == "2008076")
    assert(j.title == "Senior Python Developer")
    assert(j.job_url == "https://www.topcv.vn/viec-lam/senior-python-developer-2008076.html")
    assert(j.company_name == "FPT Software")
    assert(j.company_url == "https://www.topcv.vn/cong-ty/fpt-software")
    assert(j.salary == "25 - 40 triệu")
    assert(j.skills == Seq("Python", "Django", "PostgreSQL", "Redis"))
    assert(j.location == "Hà Nội & Hồ Chí Minh") // entities decoded like get_text
    assert(j.deadline == "23")
    assert(j.verified_employer)
    assert(j.last_update == "Cập nhật 3 ngày trước")
    assert(j.logo_url == "https://cdn.topcv.vn/logo.png")
  }

  test("extractJob: job_id fallback from href; missing required → None") {
    val noId = card.replace(""" data-job-id="2008076"""", "")
    assert(HtmlParser.extractJob(noId).get.job_id == "2008076") // from -2008076.html
    val noTitle = card.replaceAll("(?s)<h3.*?</h3>", "")
    assert(HtmlParser.extractJob(noTitle).isEmpty)
  }

  test("parsePage: dedup by job_id, first seen wins") {
    val twoCards = card + "\n" + card
    assert(HtmlParser.parsePage(twoCards).length == 1)
  }

  test("parseJobs DataFrame surface + extraction stats") {
    val df = Seq(card).toDF("html")
    val jobs = HtmlParser.parseJobs(df)
    assert(jobs.count() == 1)
    val stats = HtmlParser.extractionStats(jobs).head()
    assert(stats.getAs[Long]("total") == 1)
    assert(stats.getAs[Double]("company_name_rate") == 1.0)
  }

  // --- validators (test_validators.py shapes) ---
  private def jobsDf(rows: Seq[(String, String, String)]) =
    rows.toDF("job_id", "title", "company_name")

  test("crawl validation: valid rate and per-field missing") {
    val df = jobsDf(Seq(
      ("123", "Senior Dev", "ACME"),
      (null, "Test Job", "ACME"),        // missing id
      ("abc", "X", "ACME"),              // non-numeric id
      ("456", "", "ACME"),               // empty title
      ("789", "Ok Title", null)))        // missing company
    val r = Validators.crawlStats(df).head()
    assert(r.getAs[Long]("total_jobs") == 5)
    assert(r.getAs[Long]("valid_jobs") == 1)
    assert(r.getAs[Double]("missing_job_id_rate") == 0.4)
    assert(r.getAs[Double]("missing_title_rate") == 0.2)
    assert(r.getAs[Double]("missing_company_rate") == 0.2)
  }

  test("duplicate rate") {
    val df = jobsDf(Seq(("1", "A", "C"), ("1", "A", "C"), ("2", "B", "C"), ("3", "B", "C")))
    assert(Validators.crawlStats(df).head().getAs[Double]("duplicate_rate") == 0.25)
  }

  test("business rules: each violation counter fires") {
    val rows = Seq(
      // salary_min, salary_max, deadline, title, company, location
      (Some(-1.0), Some(10.0), "2026-04-01", "Valid Title", "ACME Corp", "Hà Nội"),   // salary_invalid
      (Some(10.0), Some(300000000.0), "2026-04-01", "Valid Title", "ACME Corp", "Hà Nội"), // too_high
      (Some(10.0), Some(600000000.0), "2026-04-01", "Valid Title", "ACME Corp", "Hà Nội"), // suspicious
      (None, None, "2026-01-01", "Valid Title", "ACME Corp", "Hà Nội"),               // deadline_past
      (None, None, "2027-06-01", "Valid Title", "ACME Corp", "Hà Nội"),               // too_far
      (None, None, "2026-06-20", "Dev", "ACME Corp", "Hà Nội"),                       // title_too_short (+ deadline warn)
      (None, None, "2026-04-01", "Valid Title", "AB", "Hà Nội"),                      // company_too_short
      (None, None, "2026-04-01", "Valid Title", "ACME Corp", "n/a"))                  // location_invalid
      .map { case (mn, mx, d, t, c, l) =>
        (mn.map(BigDecimal(_)).orNull, mx.map(BigDecimal(_)).orNull,
          java.sql.Date.valueOf(d), t, c, l) }
      .toDF("salary_min", "salary_max", "deadline", "title", "company_name", "location")
    val r = Validators.businessRuleStats(rows, lit("2026-03-01")).head()
    assert(r.getAs[Long]("salary_invalid") == 1)
    assert(r.getAs[Long]("salary_too_high") == 1)
    assert(r.getAs[Long]("salary_suspicious") == 1)
    assert(r.getAs[Long]("deadline_past") == 1)
    assert(r.getAs[Long]("deadline_too_far") == 1)      // 2027-06-01 (457 d)
    assert(r.getAs[Long]("deadline_suspicious") == 1)   // 2026-06-20 (111 d)
    assert(r.getAs[Long]("title_too_short") == 1)
    assert(r.getAs[Long]("company_too_short") == 1)
    assert(r.getAs[Long]("location_invalid") == 1)
    assert(r.getAs[String]("status") == "unhealthy") // 7 hard violations / 8 rows
  }

  test("quality gate: thresholds and hard fails") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("total_jobs", LongType), StructField("duplicate_rate", DoubleType),
      StructField("valid_rate", DoubleType)))
    def stats(total: Long, dup: Double, valid: Double): Row =
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any](total, dup, valid), schema)
    // success
    assert(QualityGate.evaluate(stats(100, 0.05, 0.95)).status == "success")
    // warning band
    assert(QualityGate.evaluate(stats(100, 0.05, 0.80)).status == "warning")
    // hard fails
    intercept[ValidationHardFailError](QualityGate.evaluate(stats(0, 0, 0)))
    intercept[ValidationHardFailError](QualityGate.evaluate(stats(10, 0, 1.0)))   // below min count
    intercept[ValidationHardFailError](QualityGate.evaluate(stats(100, 0.5, 1.0))) // dup rate
    intercept[ValidationHardFailError](QualityGate.evaluate(stats(100, 0.0, 0.5))) // low valid
  }
}
