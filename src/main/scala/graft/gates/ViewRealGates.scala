package graft.gates

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.views.{Star, Views}
import graft.warehouse.Schemas

/** Gates that run the REAL `Views` functions (not pattern analogues) over
  * a star schema synthesized deterministically from the testdata:
  * part ⇒ DimJob, supplier ⇒ DimCompany, nation ⇒ DimLocation,
  * orders ⇒ FactJobPostingDaily + bridge. The oracle reconstructs the same
  * star as CTEs and states each view's reference SQL over it.
  *
  * Only the row-level / no-average views are gated this way: the rounded
  * AVG views would compare Spark's exact-decimal rounding against
  * DuckDB's float rounding (ulp-level mismatch); their aggregation
  * patterns are covered by the `view_*` gates through [[graft.Exact]].
  */
object ViewRealGates {

  /** The shared star construction. */
  def star(s: SparkSession, dir: String): Star = {
    val part = Tables(s, dir, "part")
    val supplier = Tables(s, dir, "supplier")
    val nation = Tables(s, dir, "nation")
    val orders = Tables(s, dir, "orders")

    val dimJob = part.select(
      col("p_partkey").cast("string").as("job_id"),
      col("p_partkey").as("job_sk"),
      col("p_name").as("title"),
      concat(lit("https://x/"), col("p_partkey")).as("job_url"),
      split(col("p_type"), " ").as("skills"),
      lit("2026-01-01").cast("date").as("effective_date"),
      lit(null).cast("date").as("expiry_date"),
      (col("p_partkey") % 7 =!= 0).as("is_current"))

    val dimCompany = supplier.select(
      md5(col("s_name")).as("company_bk_hash"),
      col("s_suppkey").as("company_sk"),
      col("s_name").as("company_name"),
      concat(lit("https://c/"), col("s_suppkey")).as("company_url"),
      lit(null).cast("string").as("logo_url"),
      (col("s_acctbal") > 0).as("verified_employer"),
      lit("2026-01-01").cast("date").as("effective_date"),
      lit(null).cast("date").as("expiry_date"),
      (col("s_suppkey") % 10 =!= 0).as("is_current"))

    val dimLocation = nation.select(
      col("n_nationkey").cast("long").as("location_sk"),
      when(col("n_nationkey") % 3 === 0, concat(lit("Hà Nội "), col("n_nationkey")))
        .when(col("n_nationkey") % 3 === 1, concat(lit("HCM "), col("n_nationkey")))
        .otherwise(concat(lit("City "), col("n_nationkey"))).as("city"),
      lit("Vietnam").as("country"))

    val fact = orders.select(
      col("o_orderkey").as("fact_id"),
      col("o_custkey").as("job_sk"),
      (col("o_custkey") % 100).as("company_sk"),
      to_date(col("o_orderdate")).as("date_id"),
      to_date(col("o_orderdate")).as("posted_date_id"),
      date_add(to_date(col("o_orderdate")), 14).as("due_date_id"),
      col("o_totalprice").cast("decimal(18,2)").as("salary_min"),
      (col("o_totalprice") * 2).cast("decimal(18,2)").as("salary_max"),
      lit("range").as("salary_type"),
      lit(null).cast("string").as("time_remaining"),
      col("o_orderdate").cast("timestamp").as("posted_time"),
      (col("o_orderdate").cast("timestamp").cast("long") + 14 * 86400L)
        .cast("timestamp").as("due_date"),
      lit("2026-01-01 07:00:00").cast("timestamp").as("crawled_at"),
      date_format(col("o_orderdate"), "yyyy-MM").as("load_month"))

    val bridge = orders.select(col("o_orderkey").as("fact_id"),
        explode(array_distinct(array(
          col("o_orderkey") % 25,
          when(col("o_orderkey") % 4 === 0, (col("o_orderkey") + 7) % 25)
            .otherwise(col("o_orderkey") % 25)))).as("location_sk"))
      .select((col("fact_id") * 100 + col("location_sk")).as("bridge_id"),
        col("fact_id"), col("location_sk").cast("long").as("location_sk"))

    Star(dimJob, dimCompany, dimLocation,
      Schemas.empty(s, org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("date_id",
          org.apache.spark.sql.types.DateType)))),
      fact, bridge)
  }

  /** The same star as DuckDB CTE text. */
  val starSql: String =
    """dim_job AS (
      |  SELECT CAST(p_partkey AS VARCHAR) AS job_id, p_partkey AS job_sk,
      |         p_name AS title, 'https://x/' || CAST(p_partkey AS VARCHAR) AS job_url,
      |         string_split(p_type, ' ') AS skills,
      |         (p_partkey % 7 <> 0) AS is_current
      |  FROM part),
      |dim_company AS (
      |  SELECT s_suppkey AS company_sk, s_name AS company_name,
      |         'https://c/' || CAST(s_suppkey AS VARCHAR) AS company_url,
      |         (s_acctbal > 0) AS verified_employer,
      |         (s_suppkey % 10 <> 0) AS is_current
      |  FROM supplier),
      |dim_location AS (
      |  SELECT CAST(n_nationkey AS BIGINT) AS location_sk,
      |         CASE WHEN n_nationkey % 3 = 0 THEN 'Hà Nội ' || CAST(n_nationkey AS VARCHAR)
      |              WHEN n_nationkey % 3 = 1 THEN 'HCM ' || CAST(n_nationkey AS VARCHAR)
      |              ELSE 'City ' || CAST(n_nationkey AS VARCHAR) END AS city,
      |         'Vietnam' AS country
      |  FROM nation),
      |fact AS (
      |  SELECT o_orderkey AS fact_id, o_custkey AS job_sk,
      |         o_custkey % 100 AS company_sk,
      |         CAST(o_orderdate AS DATE) AS date_id,
      |         CAST(o_totalprice AS DECIMAL(18,2)) AS salary_min,
      |         CAST(o_totalprice * 2 AS DECIMAL(18,2)) AS salary_max,
      |         'range' AS salary_type,
      |         CAST(NULL AS VARCHAR) AS time_remaining,
      |         o_orderdate AS posted_time,
      |         o_orderdate + INTERVAL 14 DAY AS due_date,
      |         TIMESTAMP '2026-01-01 07:00:00' AS crawled_at,
      |         strftime(o_orderdate, '%Y-%m') AS load_month
      |  FROM orders),
      |bridge AS (
      |  SELECT DISTINCT o_orderkey AS fact_id,
      |         CAST(loc AS BIGINT) AS location_sk
      |  FROM (SELECT o_orderkey, unnest([o_orderkey % 25,
      |          CASE WHEN o_orderkey % 4 = 0 THEN (o_orderkey + 7) % 25
      |               ELSE o_orderkey % 25 END]) AS loc
      |        FROM orders))""".stripMargin

  /** vw_current_jobs over the synthesized star. */
  def realCurrentJobs(s: SparkSession, dir: String): DataFrame =
    Views.currentJobs(star(s, dir))
      .select(col("job_sk"), col("job_id"), col("title"), col("company_sk"),
        col("company_name"), col("verified_employer"), col("date_id"),
        col("salary_min").cast("double").as("salary_min"),
        col("salary_max").cast("double").as("salary_max"), col("salary_type"))
      .orderBy("job_sk", "date_id", "salary_min")

  val realCurrentJobsSql: String =
    s"""WITH $starSql
       |SELECT j.job_sk, j.job_id, j.title, c.company_sk, c.company_name,
       |       c.verified_employer, f.date_id,
       |       CAST(f.salary_min AS DOUBLE) AS salary_min,
       |       CAST(f.salary_max AS DOUBLE) AS salary_max, f.salary_type
       |FROM dim_job j
       |JOIN fact f ON j.job_sk = f.job_sk
       |JOIN dim_company c ON f.company_sk = c.company_sk
       |WHERE j.is_current = TRUE AND c.is_current = TRUE
       |ORDER BY j.job_sk, f.date_id, CAST(f.salary_min AS DOUBLE)""".stripMargin

  /** vw_job_locations over the synthesized star. */
  def realJobLocations(s: SparkSession, dir: String): DataFrame =
    Views.jobLocations(star(s, dir))
      .orderBy("fact_id", "location_sk")

  val realJobLocationsSql: String =
    s"""WITH $starSql
       |SELECT f.fact_id, f.job_sk, j.job_id, j.title, f.date_id,
       |       l.location_sk, l.city, l.country
       |FROM fact f
       |JOIN dim_job j ON f.job_sk = j.job_sk
       |JOIN bridge b ON f.fact_id = b.fact_id
       |JOIN dim_location l ON b.location_sk = l.location_sk
       |WHERE j.is_current = TRUE
       |ORDER BY f.fact_id, l.location_sk""".stripMargin

  /** vw_jobs_hanoi over the synthesized star, anchored to a populated
    * date. */
  def realJobsHanoi(s: SparkSession, dir: String): DataFrame =
    Views.jobsHanoi(star(s, dir), lit("1996-09-17"))
      .withColumn("salary_min", col("salary_min").cast("double"))
      .withColumn("salary_max", col("salary_max").cast("double"))
      .drop("skills", "due_date", "time_remaining")
      .orderBy("job_id", "salary_min")

  val realJobsHanoiSql: String =
    s"""WITH $starSql
       |SELECT j.job_id, j.title, c.company_name, c.verified_employer,
       |       CAST(f.salary_min AS DOUBLE) AS salary_min,
       |       CAST(f.salary_max AS DOUBLE) AS salary_max,
       |       j.job_url
       |FROM fact f
       |JOIN dim_job j ON f.job_sk = j.job_sk AND j.is_current = TRUE
       |JOIN dim_company c ON f.company_sk = c.company_sk AND c.is_current = TRUE
       |JOIN bridge b ON f.fact_id = b.fact_id
       |JOIN dim_location l ON b.location_sk = l.location_sk
       |WHERE f.date_id = DATE '1996-09-17'
       |  AND (lower(l.city) LIKE '%hà nội%' OR lower(l.city) LIKE '%hanoi%')
       |ORDER BY job_id, salary_min""".stripMargin

  /** vw_verified_employers (sorted STRING_AGG of cities, no averages)
    * over the synthesized star. */
  def realVerified(s: SparkSession, dir: String): DataFrame =
    Views.verifiedEmployers(star(s, dir), lit("1996-09-17"))
      .withColumn("salary_min", col("salary_min").cast("double"))
      .withColumn("salary_max", col("salary_max").cast("double"))
      .drop("due_date")
      .orderBy("job_id", "salary_min")

  val realVerifiedSql: String =
    s"""WITH $starSql
       |SELECT j.job_id, j.title, c.company_name,
       |       CAST(f.salary_min AS DOUBLE) AS salary_min,
       |       CAST(f.salary_max AS DOUBLE) AS salary_max,
       |       j.job_url,
       |       string_agg(DISTINCT l.city, ', ' ORDER BY l.city) AS locations
       |FROM fact f
       |JOIN dim_job j ON f.job_sk = j.job_sk AND j.is_current = TRUE
       |JOIN dim_company c ON f.company_sk = c.company_sk AND c.is_current = TRUE
       |LEFT JOIN bridge b ON f.fact_id = b.fact_id
       |LEFT JOIN dim_location l ON b.location_sk = l.location_sk
       |WHERE f.date_id = DATE '1996-09-17' AND c.verified_employer = TRUE
       |GROUP BY j.job_id, j.title, c.company_name, f.salary_min, f.salary_max,
       |         f.due_date, j.job_url
       |ORDER BY job_id, salary_min""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "real_current_jobs"  -> (realCurrentJobs _),
    "real_job_locations" -> (realJobLocations _),
    "real_jobs_hanoi"    -> (realJobsHanoi _),
    "real_verified"      -> (realVerified _))

  val oracleSql: Map[String, String] = Map(
    "real_current_jobs"  -> realCurrentJobsSql,
    "real_job_locations" -> realJobLocationsSql,
    "real_jobs_hanoi"    -> realJobsHanoiSql,
    "real_verified"      -> realVerifiedSql)
}
