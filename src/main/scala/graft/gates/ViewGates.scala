package graft.gates

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Exact, Tables}

/** Correctness gates for the analytic-view patterns (SURVEY.md §2.2–2.7).
  *
  * The reference's 15 views decompose into a small set of relational
  * patterns; each gate exercises one pattern on the testdata star schema
  * (supplier⇒company dim, part⇒job dim, orders/lineitem⇒facts,
  * documents⇒skills array), with the DuckDB oracle stating the same query.
  *
  * Aggregated doubles go through [[Exact]] (order-independent decimal sum,
  * one final IEEE division) so hashes match across engines.
  */
object ViewGates {

  /** vw_top_companies shape (base_views.sql:82-96): star join + grouped
    * countDistinct/avg/max + ranking. J2/J3 + A1/A3/A4 + O1.
    */
  def viewTopCompanies(s: SparkSession, dir: String): DataFrame = {
    val l = Tables(s, dir, "lineitem")
    val sup = Tables(s, dir, "supplier")
    l.join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(
        countDistinct(col("l_orderkey")).as("job_count"),
        Exact.davg(col("l_extendedprice")).as("avg_price"),
        max(to_date(col("l_shipdate"))).as("last_ship_date"))
      .orderBy(col("job_count").desc, col("s_suppkey"))
  }

  val viewTopCompaniesSql: String =
    s"""SELECT s_suppkey, s_name,
       |       COUNT(DISTINCT l_orderkey) AS job_count,
       |       ${Exact.sqlAvg("l_extendedprice")} AS avg_price,
       |       MAX(CAST(l_shipdate AS DATE)) AS last_ship_date
       |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
       |GROUP BY s_suppkey, s_name
       |ORDER BY job_count DESC, s_suppkey""".stripMargin

  /** vw_monthly_stats shape (base_views.sql:63-74): per-month distinct
    * counts + conditional distinct count. A1/A2/A3.
    */
  def viewMonthlyStats(s: SparkSession, dir: String): DataFrame = {
    val l = Tables(s, dir, "lineitem")
    val sup = Tables(s, dir, "supplier")
    l.join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"))
      .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("load_month"))
      .agg(
        countDistinct(col("l_orderkey")).as("job_count"),
        countDistinct(col("l_suppkey")).as("company_count"),
        Exact.davg(col("l_extendedprice")).as("avg_price"),
        countDistinct(when(col("s_acctbal") > 0, col("l_orderkey"))).as("verified_jobs"))
      .orderBy(col("load_month").desc)
  }

  val viewMonthlyStatsSql: String =
    s"""SELECT strftime(l_shipdate, '%Y-%m') AS load_month,
       |       COUNT(DISTINCT l_orderkey) AS job_count,
       |       COUNT(DISTINCT l_suppkey) AS company_count,
       |       ${Exact.sqlAvg("l_extendedprice")} AS avg_price,
       |       COUNT(DISTINCT CASE WHEN s_acctbal > 0 THEN l_orderkey END) AS verified_jobs
       |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
       |GROUP BY 1 ORDER BY load_month DESC""".stripMargin

  /** vw_salary_distribution shape (business_views.sql:127-154): CASE
    * bucketing + custom CASE sort key. F10 + O3.
    */
  def viewSalaryBuckets(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders")
    val m = col("o_totalprice") / 1000.0
    val bucket = when(m <= 100, "Dưới 100M")
      .when(m <= 150, "100M - 150M")
      .when(m <= 200, "150M - 200M")
      .when(m <= 300, "200M - 300M")
      .when(m <= 500, "300M - 500M")
      .otherwise("Trên 500M")
    val sortKey = when(col("salary_range") === "Dưới 100M", 1)
      .when(col("salary_range") === "100M - 150M", 2)
      .when(col("salary_range") === "150M - 200M", 3)
      .when(col("salary_range") === "200M - 300M", 4)
      .when(col("salary_range") === "300M - 500M", 5)
      .otherwise(6)
    o.groupBy(bucket.as("salary_range"))
      .agg(
        countDistinct(col("o_orderkey")).as("job_count"),
        countDistinct(col("o_custkey")).as("company_count"),
        Exact.davg(col("o_totalprice")).as("avg_price"))
      .orderBy(sortKey)
  }

  val viewSalaryBucketsSql: String =
    s"""SELECT CASE WHEN o_totalprice / 1000.0 <= 100 THEN 'Dưới 100M'
       |            WHEN o_totalprice / 1000.0 <= 150 THEN '100M - 150M'
       |            WHEN o_totalprice / 1000.0 <= 200 THEN '150M - 200M'
       |            WHEN o_totalprice / 1000.0 <= 300 THEN '200M - 300M'
       |            WHEN o_totalprice / 1000.0 <= 500 THEN '300M - 500M'
       |            ELSE 'Trên 500M' END AS salary_range,
       |       COUNT(DISTINCT o_orderkey) AS job_count,
       |       COUNT(DISTINCT o_custkey) AS company_count,
       |       ${Exact.sqlAvg("o_totalprice")} AS avg_price
       |FROM orders GROUP BY 1
       |ORDER BY CASE salary_range
       |  WHEN 'Dưới 100M' THEN 1 WHEN '100M - 150M' THEN 2
       |  WHEN '150M - 200M' THEN 3 WHEN '200M - 300M' THEN 4
       |  WHEN '300M - 500M' THEN 5 ELSE 6 END""".stripMargin

  /** vw_skills_demand shape (business_views.sql:252-266): UNNEST a token
    * array + count + top-k. F11 + O2 (TakeOrderedAndProject, true top-k).
    * Fully-ordered (count desc, token) so the k-boundary is deterministic.
    */
  def viewSkillsDemand(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents")
    d.select(col("doc_id"), col("n_chars"),
        explode(split(col("text"), " ")).as("skill"))
      .filter(col("skill").isNotNull && col("skill") =!= "")
      .groupBy(col("skill"))
      .agg(count(lit(1)).as("job_count"), Exact.davg(col("n_chars")).as("avg_chars"))
      .orderBy(col("job_count").desc, col("skill"))
      .limit(50)
  }

  val viewSkillsDemandSql: String =
    s"""SELECT skill, COUNT(*) AS job_count, ${Exact.sqlAvg("n_chars")} AS avg_chars
       |FROM (SELECT doc_id, n_chars, unnest(string_split(text, ' ')) AS skill
       |      FROM documents)
       |WHERE skill IS NOT NULL AND skill <> ''
       |GROUP BY skill ORDER BY job_count DESC, skill LIMIT 50""".stripMargin

  /** STRING_AGG(DISTINCT …) shape (base_views.sql:137, A6): sorted
    * collect_set join — deterministic (stricter than DuckDB's unspecified
    * order; oracle pins the same order).
    */
  def viewStringAgg(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders")
    o.groupBy(col("o_custkey"))
      .agg(
        array_join(sort_array(collect_set(col("o_orderpriority"))), ", ").as("priorities"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_custkey"))
  }

  val viewStringAggSql: String =
    """SELECT o_custkey,
      |       string_agg(DISTINCT o_orderpriority, ', ' ORDER BY o_orderpriority) AS priorities,
      |       COUNT(*) AS n_orders
      |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  /** vw_current_jobs shape (base_views.sql:10-33): row-level 3-way star
    * join with dim-currency filters, no aggregation. J2/J3 + P4.
    */
  def viewCurrentJobs(s: SparkSession, dir: String): DataFrame = {
    val l = Tables(s, dir, "lineitem")
    val p = Tables(s, dir, "part")
    val sup = Tables(s, dir, "supplier")
    l.filter(col("l_returnflag") === "N")
      .join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"))
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
        col("p_name"), col("p_brand"), col("s_name"),
        col("l_quantity"), col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_extendedprice"))
  }

  val viewCurrentJobsSql: String =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
      |       p_name, p_brand, s_name, l_quantity, l_extendedprice
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |WHERE l_returnflag = 'N'
      |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey, l_extendedprice""".stripMargin

  /** vw_jobs_expiring_soon shape (business_views.sql:96-119): date-range
    * predicate + datediff projection. P6 + F9.
    */
  def viewExpiringSoon(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders")
    val anchor = lit("1998-01-01").cast("date")
    o.filter(to_date(col("o_orderdate")) >= anchor &&
             to_date(col("o_orderdate")) <= date_add(anchor, 7))
      .select(col("o_orderkey"), col("o_totalprice"),
        datediff(to_date(col("o_orderdate")), anchor).as("days_left"))
      .orderBy(col("o_orderkey"))
  }

  val viewExpiringSoonSql: String =
    """SELECT o_orderkey, o_totalprice,
      |       CAST(date_diff('day', DATE '1998-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_left
      |FROM orders
      |WHERE CAST(o_orderdate AS DATE) >= DATE '1998-01-01'
      |  AND CAST(o_orderdate AS DATE) <= DATE '1998-01-08'
      |ORDER BY o_orderkey""".stripMargin

  /** vw_location_stats bridge shape (business_views.sql:188-203): M:N
    * bridge join + exclusion filter + grouped distinct counts. J4 + P7.
    */
  def viewBridgeStats(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders")
    val l = Tables(s, dir, "lineitem")
    val p = Tables(s, dir, "part")
    o.join(l, o("o_orderkey") === l("l_orderkey"))
      .join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .filter(col("p_brand") =!= "Brand#45")
      .groupBy(col("p_brand"))
      .agg(
        countDistinct(col("o_orderkey")).as("job_count"),
        countDistinct(col("o_custkey")).as("company_count"),
        Exact.davg(col("o_totalprice")).as("avg_price"))
      .orderBy(col("job_count").desc, col("p_brand"))
  }

  val viewBridgeStatsSql: String =
    s"""SELECT p_brand,
       |       COUNT(DISTINCT o_orderkey) AS job_count,
       |       COUNT(DISTINCT o_custkey) AS company_count,
       |       ${Exact.sqlAvg("o_totalprice")} AS avg_price
       |FROM orders
       |JOIN lineitem ON o_orderkey = l_orderkey
       |JOIN part ON l_partkey = p_partkey
       |WHERE p_brand <> 'Brand#45'
       |GROUP BY p_brand ORDER BY job_count DESC, p_brand""".stripMargin

  /** Orphan-check anti-join shape (dwh_dag.py:125-135, J6/U2): rows whose
    * FK has no match in a filtered dimension.
    */
  def viewAntiOrphans(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders")
    val c = Tables(s, dir, "customer").filter(col("c_custkey") % 2 === 0)
    o.join(c, o("o_custkey") === c("c_custkey"), "left_anti")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  val viewAntiOrphansSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_custkey % 2 = 0)
      |ORDER BY o_orderkey""".stripMargin

  /** Distinct-pairs shape (U4, dimensions/location.py:104-123). */
  def viewDistinctPairs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "customer")
      .select(col("c_nationkey"), col("c_mktsegment")).distinct()
      .orderBy(col("c_nationkey"), col("c_mktsegment"))

  val viewDistinctPairsSql: String =
    """SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
      |ORDER BY c_nationkey, c_mktsegment""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "view_top_companies"  -> (viewTopCompanies _),
    "view_monthly_stats"  -> (viewMonthlyStats _),
    "view_salary_buckets" -> (viewSalaryBuckets _),
    "view_skills_demand"  -> (viewSkillsDemand _),
    "view_string_agg"     -> (viewStringAgg _),
    "view_current_jobs"   -> (viewCurrentJobs _),
    "view_expiring_soon"  -> (viewExpiringSoon _),
    "view_bridge_stats"   -> (viewBridgeStats _),
    "view_anti_orphans"   -> (viewAntiOrphans _),
    "view_distinct_pairs" -> (viewDistinctPairs _))

  val oracleSql: Map[String, String] = Map(
    "view_top_companies"  -> viewTopCompaniesSql,
    "view_monthly_stats"  -> viewMonthlyStatsSql,
    "view_salary_buckets" -> viewSalaryBucketsSql,
    "view_skills_demand"  -> viewSkillsDemandSql,
    "view_string_agg"     -> viewStringAggSql,
    "view_current_jobs"   -> viewCurrentJobsSql,
    "view_expiring_soon"  -> viewExpiringSoonSql,
    "view_bridge_stats"   -> viewBridgeStatsSql,
    "view_anti_orphans"   -> viewAntiOrphansSql,
    "view_distinct_pairs" -> viewDistinctPairsSql)
}
