package graft.quality

import org.apache.spark.sql.SparkSession
import graft.views.Star

/** Executable ODCS data contracts (the quality blocks of the reference's
  * docs/data_contracts YAML files): every `mustBe: 0` rule as SQL run
  * verbatim over the registered star tables. A non-zero count is a
  * contract violation.
  */
object Contracts {

  case class ContractResult(table: String, rule: String, violations: Long) {
    def passed: Boolean = violations == 0
  }

  /** (table, rule name, violation-count SQL) — transcribed from
    * staging_jobs.yaml:204-238, fact_job_posting.yaml:180-240,
    * dim_job.yaml:116-127 and the dim_company/dim_location analogues,
    * with the SCD2 single-current rule the reference enforces via partial
    * unique index (dwh_schema.sql:60-61, :82-83).
    */
  val rules: Seq[(String, String, String)] = Seq(
    ("staging_jobs", "pk_not_null",
      "SELECT COUNT(*) FROM staging_jobs WHERE job_id IS NULL"),
    ("staging_jobs", "crawled_at_not_null",
      "SELECT COUNT(*) FROM staging_jobs WHERE crawled_at IS NULL"),
    ("staging_jobs", "salary_range_valid",
      """SELECT COUNT(*) FROM staging_jobs
        |WHERE salary_min IS NOT NULL AND salary_max IS NOT NULL
        |  AND salary_min > salary_max""".stripMargin),
    ("staging_jobs", "job_id_unique",
      """SELECT COUNT(*) FROM (
        |  SELECT job_id FROM staging_jobs GROUP BY job_id HAVING COUNT(*) > 1)""".stripMargin),
    ("DimJob", "pk_not_null",
      "SELECT COUNT(*) FROM DimJob WHERE job_sk IS NULL"),
    ("DimJob", "bk_not_null",
      "SELECT COUNT(*) FROM DimJob WHERE job_id IS NULL"),
    ("DimJob", "single_current_per_key",
      """SELECT COUNT(*) FROM (
        |  SELECT job_id FROM DimJob WHERE is_current
        |  GROUP BY job_id HAVING COUNT(*) > 1)""".stripMargin),
    ("DimCompany", "single_current_per_key",
      """SELECT COUNT(*) FROM (
        |  SELECT company_bk_hash FROM DimCompany WHERE is_current
        |  GROUP BY company_bk_hash HAVING COUNT(*) > 1)""".stripMargin),
    ("DimLocation", "city_country_unique",
      """SELECT COUNT(*) FROM (
        |  SELECT city, country FROM DimLocation
        |  GROUP BY city, country HAVING COUNT(*) > 1)""".stripMargin),
    ("FactJobPostingDaily", "pk_not_null",
      "SELECT COUNT(*) FROM FactJobPostingDaily WHERE fact_id IS NULL"),
    ("FactJobPostingDaily", "fk_job_valid",
      """SELECT COUNT(*) FROM FactJobPostingDaily f
        |LEFT JOIN DimJob j ON f.job_sk = j.job_sk
        |WHERE j.job_sk IS NULL""".stripMargin),
    ("FactJobPostingDaily", "fk_company_valid",
      """SELECT COUNT(*) FROM FactJobPostingDaily f
        |LEFT JOIN DimCompany c ON f.company_sk = c.company_sk
        |WHERE c.company_sk IS NULL""".stripMargin),
    ("FactJobPostingDaily", "unique_job_date",
      """SELECT COUNT(*) FROM (
        |  SELECT job_sk, date_id FROM FactJobPostingDaily
        |  GROUP BY job_sk, date_id HAVING COUNT(*) > 1)""".stripMargin),
    ("FactJobPostingDaily", "salary_range_valid",
      """SELECT COUNT(*) FROM FactJobPostingDaily
        |WHERE salary_min IS NOT NULL AND salary_max IS NOT NULL
        |  AND salary_min > salary_max""".stripMargin),
    ("FactJobLocationBridge", "fk_fact_valid",
      """SELECT COUNT(*) FROM FactJobLocationBridge b
        |LEFT JOIN FactJobPostingDaily f ON b.fact_id = f.fact_id
        |WHERE f.fact_id IS NULL""".stripMargin),
    ("FactJobLocationBridge", "pair_unique",
      """SELECT COUNT(*) FROM (
        |  SELECT fact_id, location_sk FROM FactJobLocationBridge
        |  GROUP BY fact_id, location_sk HAVING COUNT(*) > 1)""".stripMargin))

  /** Register the star + staging as temp views and run every rule. */
  def runAll(spark: SparkSession, star: Star,
             staging: Option[org.apache.spark.sql.DataFrame] = None): Seq[ContractResult] = {
    star.dimJob.createOrReplaceTempView("DimJob")
    star.dimCompany.createOrReplaceTempView("DimCompany")
    star.dimLocation.createOrReplaceTempView("DimLocation")
    star.fact.createOrReplaceTempView("FactJobPostingDaily")
    star.bridge.createOrReplaceTempView("FactJobLocationBridge")
    staging.foreach(_.createOrReplaceTempView("staging_jobs"))
    rules
      .filter { case (table, _, _) => table != "staging_jobs" || staging.isDefined }
      .map { case (table, rule, sql) =>
        ContractResult(table, rule, spark.sql(sql).head().getLong(0))
      }
  }
}
