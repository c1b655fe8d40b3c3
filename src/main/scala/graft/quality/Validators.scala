package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Three-layer data-quality validation (A8/A9) as ONE-PASS conditional
  * aggregations — the reference's per-row Python loops
  * (`src/quality/validators.py:48-87`, `:199-298`) and its staging SQL
  * (`validators.py:110-120`) each collapse into a single `agg` whose
  * partial aggregation is map-side; one 1-row result crosses to the
  * driver for gate decisions.
  */
object Validators {

  /** Crawl validation (`validators.py:48-87`): totals, dup rate, per-field
    * missing rates, valid rate. Valid = numeric job_id + nonblank title +
    * company present.
    */
  def crawlStats(jobs: DataFrame): DataFrame = {
    val idOk = col("job_id").isNotNull && col("job_id").cast("string").rlike("^\\d+$")
    val titleOk = col("title").isNotNull && trim(col("title")) =!= ""
    val companyOk = col("company_name").isNotNull
    val total = count(lit(1))
    jobs.agg(
      total.as("total_jobs"),
      countDistinct(when(col("job_id").isNotNull, col("job_id"))).as("unique_jobs"),
      round((total - countDistinct(when(col("job_id").isNotNull, col("job_id"))))
        .cast("double") / total, 6).as("duplicate_rate"),
      count(when(idOk && titleOk && companyOk, 1)).as("valid_jobs"),
      round(count(when(idOk && titleOk && companyOk, 1)).cast("double") / total, 6)
        .as("valid_rate"),
      round(count(when(!idOk, 1)).cast("double") / total, 6).as("missing_job_id_rate"),
      round(count(when(!titleOk, 1)).cast("double") / total, 6).as("missing_title_rate"),
      round(count(when(!companyOk, 1)).cast("double") / total, 6).as("missing_company_rate"))
  }

  /** Staging validation (`validators.py:110-158`): the SQL the reference
    * pushes to Postgres, as the same one-pass agg.
    */
  def stagingStats(staging: DataFrame): DataFrame = {
    val total = count(lit(1))
    val validTitle = count(when(col("title_clean").isNotNull && col("title_clean") =!= "", 1))
    val validCompany = count(when(col("company_name_standardized").isNotNull, 1))
    staging.agg(
      total.as("total_jobs"),
      countDistinct(col("job_id")).as("unique_jobs"),
      round((total - countDistinct(col("job_id"))).cast("double") / total, 6)
        .as("duplicate_rate"),
      least(validTitle, validCompany).as("valid_jobs"),
      round(least(validTitle, validCompany).cast("double") / total, 6).as("valid_rate"),
      count(when(col("salary_min").isNotNull, 1)).as("with_salary"),
      count(when(col("due_date").isNotNull, 1)).as("with_deadline"))
  }

  // Business-rule thresholds (validators.py:183-190).
  val SalaryHardCap   = 200000000L
  val SalaryWarnCap   = 500000000L
  val DeadlineHardDays = 180
  val DeadlineWarnDays = 90
  val MinTitleLen      = 5
  val MinCompanyLen    = 3

  /** The 9 business-rule violation counters (`validators.py:199-269`) in
    * one pass. `deadline` is a DATE column; `runDate` replaces
    * `datetime.now()` for determinism.
    */
  def businessRuleStats(jobs: DataFrame, runDate: Column): DataFrame = {
    val mn = col("salary_min"); val mx = col("salary_max")
    val bothSet = mn.isNotNull && mx.isNotNull
    val salaryInvalid = bothSet && (mn < 0 || mx < mn)
    val salarySuspicious = bothSet && !salaryInvalid && mx > SalaryWarnCap
    val salaryTooHigh = bothSet && !salaryInvalid && mx > SalaryHardCap && mx <= SalaryWarnCap
    val daysUntil = datediff(col("deadline").cast("date"), runDate.cast("date"))
    val hasDeadline = col("deadline").isNotNull
    val deadlinePast = hasDeadline && daysUntil < 0
    val deadlineTooFar = hasDeadline && daysUntil > DeadlineHardDays
    val deadlineSuspicious = hasDeadline && daysUntil > DeadlineWarnDays && daysUntil <= DeadlineHardDays
    val titleShort = length(trim(coalesce(col("title").cast("string"), lit("")))) < MinTitleLen
    val companyShort = length(trim(coalesce(col("company_name").cast("string"), lit("")))) < MinCompanyLen
    val locStr = trim(lower(coalesce(col("location").cast("string"), lit(""))))
    val locationInvalid = locStr.isin("", "n/a", "na", "none")

    val total = count(lit(1))
    def n(c: Column) = count(when(c, 1))
    val hard = n(salaryInvalid) + n(salaryTooHigh) + n(deadlinePast) +
      n(deadlineTooFar) + n(titleShort) + n(companyShort) + n(locationInvalid)
    val warn = n(salarySuspicious) + n(deadlineSuspicious)

    jobs.agg(
      total.as("total_jobs"),
      n(salaryInvalid).as("salary_invalid"),
      n(salaryTooHigh).as("salary_too_high"),
      n(salarySuspicious).as("salary_suspicious"),
      n(deadlinePast).as("deadline_past"),
      n(deadlineTooFar).as("deadline_too_far"),
      n(deadlineSuspicious).as("deadline_suspicious"),
      n(titleShort).as("title_too_short"),
      n(companyShort).as("company_too_short"),
      n(locationInvalid).as("location_invalid"),
      round(hard.cast("double") / total, 6).as("violation_rate"),
      // status thresholds: validators.py:276-281
      when(hard.cast("double") / total > 0.10, "unhealthy")
        .when(hard.cast("double") / total > 0.05 ||
          warn.cast("double") > total * 0.10, "degraded")
        .otherwise("healthy").as("status"))
  }
}
