package graft.gates

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions._

/** Correctness gates for the scalar-function core (F1–F8).
  *
  * The testdata carries no Vietnamese job strings, so each gate SYNTHESIZES
  * deterministic inputs from testdata columns (keyed by row id), runs the
  * graft function on them, and the DuckDB oracle computes the expected
  * output ANALYTICALLY from the same construction — exercising the real
  * function implementations against independently-derived expectations.
  */
object FunctionGates {

  /** F1 clean_title over synthesized titles (3 shapes by p_partkey%3). */
  def funcCleanTitle(s: SparkSession, dir: String): DataFrame = {
    val p = Tables(s, dir, "part")
    val input = when(col("p_partkey") % 3 === 0,
        concat(col("p_type"), lit(" Developer - Thu Nhập Upto "), col("p_size"), lit(" Triệu")))
      .when(col("p_partkey") % 3 === 1,
        concat(col("p_type"), lit(" Developer(Java,Spring)")))
      .otherwise(concat(col("p_type"), lit(" Developer | Lương 30 Triệu")))
    p.select(col("p_partkey"), Cleaners.cleanTitle(input).as("title_clean"))
      .orderBy("p_partkey")
  }

  val funcCleanTitleSql: String =
    """SELECT p_partkey,
      |       CASE WHEN p_partkey % 3 = 1
      |            THEN p_type || ' Developer (Java, Spring)'
      |            ELSE p_type || ' Developer' END AS title_clean
      |FROM part ORDER BY p_partkey""".stripMargin

  /** F2 clean_company_name + F7 company hash. p_type is a single ASCII
    * word, so the recapitalization is plain capitalize; TNHH stays upper.
    */
  def funcCompany(s: SparkSession, dir: String): DataFrame = {
    val p = Tables(s, dir, "part")
    val name = concat(lit("công ty tnhh "), lower(col("p_type")), lit(" tuyển dụng"))
    p.select(
        col("p_partkey"),
        Cleaners.cleanCompanyName(name).as("company_clean"),
        Hashes.companyHash(col("p_brand")).as("company_hash"))
      .orderBy("p_partkey")
  }

  val funcCompanySql: String =
    """SELECT p_partkey,
      |       'Công Ty TNHH ' || upper(substr(lower(p_type),1,1)) || substr(lower(p_type),2)
      |         AS company_clean,
      |       md5(lower(p_brand)) AS company_hash
      |FROM part ORDER BY p_partkey""".stripMargin

  /** F3 normalize_salary over all branch shapes (keyed p_partkey%8).
    * Outputs cast to double on both sides to dodge decimal-precision
    * differences between engines.
    */
  def funcSalary(s: SparkSession, dir: String): DataFrame = {
    val p = Tables(s, dir, "part")
    val sz = col("p_size").cast("string")
    val input = when(col("p_partkey") % 8 === 0,
        concat(sz, lit(" - "), col("p_size") * 2, lit(" triệu")))
      .when(col("p_partkey") % 8 === 1, lit("Thoả thuận"))
      .when(col("p_partkey") % 8 === 2, concat(lit("Tới "), sz, lit(" USD")))
      .when(col("p_partkey") % 8 === 3, concat(lit("Từ "), sz, lit(" triệu")))
      .when(col("p_partkey") % 8 === 4, lit("Cạnh tranh"))
      .when(col("p_partkey") % 8 === 5, concat(sz, lit(" USD")))
      .when(col("p_partkey") % 8 === 6, concat(sz, lit(" - "), col("p_size") * 3, lit(" USD")))
      .otherwise(lit("liên hệ"))
    val r = Salary.normalizeSalary(input)
    p.select(
        col("p_partkey"),
        r.getField("salary_min").cast("double").as("salary_min"),
        r.getField("salary_max").cast("double").as("salary_max"),
        r.getField("salary_type").as("salary_type"))
      .orderBy("p_partkey")
  }

  val funcSalarySql: String =
    """SELECT p_partkey,
      |  CASE WHEN p_partkey % 8 = 0 THEN CAST(p_size AS DOUBLE) * 1000000
      |       WHEN p_partkey % 8 = 3 THEN CAST(p_size AS DOUBLE) * 1000000
      |       WHEN p_partkey % 8 = 5 THEN CAST(p_size AS DOUBLE) * 25000
      |       WHEN p_partkey % 8 = 6 THEN CAST(p_size AS DOUBLE) * 25000
      |       END AS salary_min,
      |  CASE WHEN p_partkey % 8 = 0 THEN CAST(p_size AS DOUBLE) * 2000000
      |       WHEN p_partkey % 8 = 2 THEN CAST(p_size AS DOUBLE) * 25000
      |       WHEN p_partkey % 8 = 5 THEN CAST(p_size AS DOUBLE) * 25000
      |       WHEN p_partkey % 8 = 6 THEN CAST(p_size AS DOUBLE) * 75000
      |       END AS salary_max,
      |  CASE WHEN p_partkey % 8 = 0 THEN 'range'
      |       WHEN p_partkey % 8 = 1 THEN 'negotiable'
      |       WHEN p_partkey % 8 = 2 THEN 'upto'
      |       WHEN p_partkey % 8 = 3 THEN 'from'
      |       WHEN p_partkey % 8 = 4 THEN 'competitive'
      |       WHEN p_partkey % 8 = 5 THEN 'range'
      |       WHEN p_partkey % 8 = 6 THEN 'range'
      |       ELSE 'unknown' END AS salary_type
      |FROM part ORDER BY p_partkey""".stripMargin

  /** F4 due_date + F5 time_remaining over orders (deadline = o_orderkey%30
    * days from o_orderdate; countdown vs fixed now=1998-01-01).
    */
  def funcDeadline(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders")
    val due = Salary.dueDate(col("o_orderdate"), (col("o_orderkey") % 30).cast("string"))
    val now = lit("1998-01-01 00:00:00").cast("timestamp")
    o.select(
        col("o_orderkey"),
        date_format(due, "yyyy-MM-dd HH:mm:ss").as("due_date"),
        Salary.timeRemaining(due, now).as("time_remaining"))
      .orderBy("o_orderkey")
  }

  val funcDeadlineSql: String =
    """SELECT o_orderkey,
      |  strftime(o_orderdate + (o_orderkey % 30) * INTERVAL 1 DAY,
      |           '%Y-%m-%d %H:%M:%S') AS due_date,
      |  CASE WHEN o_orderdate + (o_orderkey % 30) * INTERVAL 1 DAY <= TIMESTAMP '1998-01-01 00:00:00'
      |       THEN 'Đã hết thời gian ứng tuyển'
      |       ELSE 'Còn ' || CAST(date_diff('day', TIMESTAMP '1998-01-01 00:00:00',
      |                       o_orderdate + (o_orderkey % 30) * INTERVAL 1 DAY) AS VARCHAR)
      |            || ' ngày để ứng tuyển' END AS time_remaining
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** F6 parse_location over synthesized location strings (4 shapes by
    * n_nationkey%4), exploded to (key, city, country) rows.
    */
  def funcLocation(s: SparkSession, dir: String): DataFrame = {
    val n = Tables(s, dir, "nation")
    val input = when(col("n_nationkey") % 4 === 0, lit("Hà Nội & Hồ Chí Minh"))
      .when(col("n_nationkey") % 4 === 1, lit("Đà Nẵng"))
      .when(col("n_nationkey") % 4 === 2, lit("Nhật Bản"))
      .otherwise(lit("Hà Nội & 2 nơi khác"))
    n.select(col("n_nationkey"),
        explode(Locations.parseLocations(input)).as("loc"))
      .select(col("n_nationkey"),
        col("loc.city").as("city"), col("loc.country").as("country"))
      .orderBy("n_nationkey", "city")
  }

  val funcLocationSql: String =
    """WITH m AS (SELECT n_nationkey, n_nationkey % 4 AS v FROM nation)
      |SELECT n_nationkey, 'Hà Nội' AS city, 'Vietnam' AS country FROM m WHERE v = 0
      |UNION ALL
      |SELECT n_nationkey, 'Hồ Chí Minh (mới)', 'Vietnam' FROM m WHERE v = 0
      |UNION ALL
      |SELECT n_nationkey, 'Đà Nẵng (mới)', 'Vietnam' FROM m WHERE v = 1
      |UNION ALL
      |SELECT n_nationkey, 'Unknown', 'Nhật Bản' FROM m WHERE v = 2
      |UNION ALL
      |SELECT n_nationkey, 'Hà Nội', 'Vietnam' FROM m WHERE v = 3
      |ORDER BY n_nationkey, city""".stripMargin

  /** F8 parse_last_update over all unit shapes (keyed p_partkey%7). */
  def funcLastUpdate(s: SparkSession, dir: String): DataFrame = {
    val p = Tables(s, dir, "part")
    val sz = col("p_size").cast("string")
    val input = when(col("p_partkey") % 7 === 0, concat(lit("Cập nhật "), sz, lit(" tháng trước")))
      .when(col("p_partkey") % 7 === 1, concat(lit("Cập nhật "), sz, lit(" tuần trước")))
      .when(col("p_partkey") % 7 === 2, concat(lit("Cập nhật "), sz, lit(" ngày trước")))
      .when(col("p_partkey") % 7 === 3, concat(lit("Cập nhật "), sz, lit(" giờ trước")))
      .when(col("p_partkey") % 7 === 4, concat(lit("Cập nhật "), sz, lit(" phút trước")))
      .when(col("p_partkey") % 7 === 5, concat(lit("Cập nhật "), sz, lit(" trước")))
      .otherwise(lit("Cập nhật gần đây"))
    p.select(col("p_partkey"),
        LastUpdate.lastUpdateSeconds(input).as("last_update_secs"))
      .orderBy("p_partkey")
  }

  val funcLastUpdateSql: String =
    """SELECT p_partkey,
      |  CAST(CASE p_partkey % 7
      |    WHEN 0 THEN p_size * 2592000
      |    WHEN 1 THEN p_size * 604800
      |    WHEN 2 THEN p_size * 86400
      |    WHEN 3 THEN p_size * 3600
      |    WHEN 4 THEN p_size * 60
      |    WHEN 5 THEN p_size
      |    ELSE 0 END AS BIGINT) AS last_update_secs
      |FROM part ORDER BY p_partkey""".stripMargin

  /** [[graft.functions.Urls]]: parse + canonicalize over URLs
    * synthesized with every mess a crawl frontier sees — uppercase
    * scheme/host, explicit default port, shuffled query params,
    * tracking params, fragments — keyed off doc_id so each variant mix
    * is deterministic. The oracle restates extraction with regexps and
    * the param sort with list ops; rows that differ only in mess must
    * collapse to the same `canonical` string on both engines.
    */
  def urlCanonicalize(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents")
    val id = col("doc_id")
    val url = concat(
      when(id % 2 === 0, lit("https")).otherwise(lit("HTTPS")), lit("://"),
      when(id % 3 === 0, lit("Jobs")).otherwise(lit("jobs")),
      (id % 4).cast("string"), lit(".Example.com"),
      when(id % 5 === 0, lit(":443")).otherwise(lit("")),
      lit("/postings/item"), (id % 7).cast("string"), lit("?"),
      when(id % 2 === 0, lit("page=2&q=spark")).otherwise(lit("q=spark&page=2")),
      when(id % 3 === 0, lit("&utm_source=feed&gclid=xyz")).otherwise(lit("")),
      // valueless click-id: must be dropped like its '=' form
      when(id % 4 === 1, lit("&fbclid")).otherwise(lit("")),
      when(id % 6 === 0, lit("#sec")).otherwise(lit("")))
    d.select(id, url.as("url"))
      .select(col("doc_id"), col("url"),
        Urls.host(col("url")).as("host"),
        Urls.path(col("url")).as("path"),
        Urls.port(col("url")).as("port"),
        Urls.param(col("url"), "q").as("q_param"),
        Urls.canonicalize(col("url")).as("canonical"))
      .orderBy("doc_id")
  }

  val urlCanonicalizeSql: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    (CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'HTTPS' END) || '://' ||
      |    (CASE WHEN doc_id % 3 = 0 THEN 'Jobs' ELSE 'jobs' END) ||
      |    CAST(doc_id % 4 AS VARCHAR) || '.Example.com' ||
      |    (CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END) ||
      |    '/postings/item' || CAST(doc_id % 7 AS VARCHAR) || '?' ||
      |    (CASE WHEN doc_id % 2 = 0 THEN 'page=2&q=spark'
      |          ELSE 'q=spark&page=2' END) ||
      |    (CASE WHEN doc_id % 3 = 0 THEN '&utm_source=feed&gclid=xyz'
      |          ELSE '' END) ||
      |    (CASE WHEN doc_id % 4 = 1 THEN '&fbclid' ELSE '' END) ||
      |    (CASE WHEN doc_id % 6 = 0 THEN '#sec' ELSE '' END) AS url
      |  FROM documents),
      |p AS (
      |  SELECT doc_id, url,
      |    lower(regexp_extract(url, '^([^:]+)://', 1)) AS proto,
      |    regexp_extract(url, '^[^:]+://([^/?#]*)', 1) AS hostport,
      |    regexp_extract(url, '^[^:]+://[^/?#]*(/[^?#]*)', 1) AS path,
      |    regexp_extract(url, '\?([^#]*)', 1) AS rawq
      |  FROM d),
      |q AS (
      |  SELECT doc_id, url, proto, path,
      |    lower(CASE WHEN hostport LIKE '%:%'
      |               THEN regexp_extract(hostport, '^(.*):', 1)
      |               ELSE hostport END) AS host,
      |    regexp_extract(hostport, ':([0-9]+)$', 1) AS port,
      |    array_to_string(list_sort(list_filter(string_split(rawq, '&'),
      |      x -> NOT regexp_matches(x, '^(utm_[^=]*|fbclid|gclid|msclkid)(=|$)')
      |           AND x <> '')), '&') AS sq,
      |    regexp_extract(rawq, '(^|&)q=([^&]*)', 2) AS q_param
      |  FROM p)
      |SELECT doc_id, url, host, path, port, q_param,
      |  proto || '://' || host ||
      |  (CASE WHEN port <> '' AND NOT (proto = 'https' AND port = '443')
      |             AND NOT (proto = 'http' AND port = '80')
      |        THEN ':' || port ELSE '' END) ||
      |  (CASE WHEN path = '' THEN '/' ELSE path END) ||
      |  (CASE WHEN sq <> '' THEN '?' || sq ELSE '' END) AS canonical
      |FROM q ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "url_canonicalize" -> (urlCanonicalize _),
    "func_clean_title" -> (funcCleanTitle _),
    "func_company"     -> (funcCompany _),
    "func_salary"      -> (funcSalary _),
    "func_deadline"    -> (funcDeadline _),
    "func_location"    -> (funcLocation _),
    "func_last_update" -> (funcLastUpdate _))

  val oracleSql: Map[String, String] = Map(
    "url_canonicalize" -> urlCanonicalizeSql,
    "func_clean_title" -> funcCleanTitleSql,
    "func_company"     -> funcCompanySql,
    "func_salary"      -> funcSalarySql,
    "func_deadline"    -> funcDeadlineSql,
    "func_location"    -> funcLocationSql,
    "func_last_update" -> funcLastUpdateSql)
}
