package graft.gates

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ingest.HtmlParser

/** Gates for the ingest parser (S2) and the remaining filter/join shapes
  * (P5 ILIKE, J7 left-semi).
  */
object IngestGates {

  /** S2: synthesize one job card per part row, run the real HTML parser
    * over the page, output the extracted fields. The oracle reconstructs
    * the expected extraction analytically from the same construction.
    */
  def ingestParse(s: SparkSession, dir: String): DataFrame = {
    val p = Tables(s, dir, "part")
    val html = concat(
      lit("""<div class="job-item-2" data-job-id=""""), col("p_partkey"), lit("\">"),
      lit("""<h3 class="title"><a href="/viec-lam/x-"""), col("p_partkey"),
      lit(""".html"><span data-original-title="Engineer """), col("p_name"),
      lit("""">t</span></a></h3>"""),
      lit("""<a class="company" href="/cong-ty/c">"""), col("p_brand"), lit("</a>"),
      lit("""<label class="title-salary">"""), col("p_size"), lit(""" - """),
      col("p_size") * 2, lit(""" triệu</label>"""),
      lit("""<label class="address">Hà Nội</label>"""),
      lit("""<div class="skills"><label class="item">"""), col("p_type"),
      lit("""</label></div>"""),
      lit("""<label class="time"><strong>"""), col("p_size"), lit("""</strong></label>"""),
      lit("""</div>"""))
    HtmlParser.parseJobs(p.select(html.as("html")))
      .select(col("job_id"), col("title"), col("job_url"), col("company_name"),
        col("salary"), col("location"), col("deadline"),
        element_at(col("skills"), 1).as("skill0"), col("verified_employer"))
      .orderBy(col("job_id").cast("long"))
  }

  val ingestParseSql: String =
    """SELECT CAST(p_partkey AS VARCHAR) AS job_id,
      |       'Engineer ' || p_name AS title,
      |       'https://www.topcv.vn/viec-lam/x-' || CAST(p_partkey AS VARCHAR) || '.html' AS job_url,
      |       p_brand AS company_name,
      |       CAST(p_size AS VARCHAR) || ' - ' || CAST(p_size * 2 AS VARCHAR) || ' triệu' AS salary,
      |       'Hà Nội' AS location,
      |       CAST(p_size AS VARCHAR) AS deadline,
      |       p_type AS skill0,
      |       FALSE AS verified_employer
      |FROM part ORDER BY p_partkey""".stripMargin

  /** P5: ILIKE-style pattern predicate (the vw_jobs_hanoi city filter
    * shape) — lower-contains on a scanned column.
    */
  def viewIlike(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "part")
      .filter(lower(col("p_name")).contains("green") ||
        lower(col("p_name")).contains("blue"))
      .select(col("p_partkey"), col("p_name"))
      .orderBy("p_partkey")

  val viewIlikeSql: String =
    """SELECT p_partkey, p_name FROM part
      |WHERE lower(p_name) LIKE '%green%' OR lower(p_name) LIKE '%blue%'
      |ORDER BY p_partkey""".stripMargin

  /** J7: keep-matching left-semi (the orphan-bridge cleanup shape). */
  def viewSemiJoin(s: SparkSession, dir: String): DataFrame = {
    val l = Tables(s, dir, "lineitem")
    val o = Tables(s, dir, "orders").filter(col("o_orderstatus") === "F")
    l.join(o.select("o_orderkey"),
        l("l_orderkey") === col("o_orderkey"), "left_semi")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_extendedprice"))
  }

  val viewSemiJoinSql: String =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_extendedprice
      |FROM lineitem
      |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
      |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey, l_extendedprice""".stripMargin

  /** [[graft.storage.Jsonl]] interchange boundary: the documents table
    * exported as JSONL (temp-and-swap), read back with the PINNED
    * schema, and rolled up per language — the oracle computes the same
    * rollup from the parquet table directly, so the gate is green only
    * if the JSON round trip preserved every row, every text byte
    * (distinct-md5 count), and every numeric exactly.
    */
  def jsonlRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    val path = java.nio.file.Files.createTempDirectory("graft_jsonl")
      .resolve("docs.jsonl").toString
    graft.storage.Jsonl.write(docs, path)
    val back = graft.storage.Jsonl.read(s, path, docs.schema)
    back.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(length(col("text"))).as("sum_text_len"),
        countDistinct(md5(col("text"))).as("n_distinct_texts"),
        min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"))
      .orderBy("lang")
  }

  val jsonlRoundtripSql: String =
    """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(sum(length(text)) AS BIGINT) AS sum_text_len,
      |  CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct_texts,
      |  min(doc_id) AS min_id, max(doc_id) AS max_id
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** [[graft.storage.Csv]] interchange boundary, same contract as the
    * JSONL gate: export documents as RFC-4180 CSV (temp-and-swap), read
    * back with the PINNED schema, roll up per source — green only if
    * quoting preserved every text byte and every numeric exactly
    * against the parquet-direct oracle.
    */
  def csvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    val path = java.nio.file.Files.createTempDirectory("graft_csv")
      .resolve("docs.csv").toString
    graft.storage.Csv.write(docs, path)
    val back = graft.storage.Csv.read(s, path, docs.schema)
    back.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(length(col("lang"))).as("sum_lang_len"),
        countDistinct(md5(col("text"))).as("n_distinct_texts"),
        min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"))
      .orderBy("source")
  }

  val csvRoundtripSql: String =
    """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(sum(length(lang)) AS BIGINT) AS sum_lang_len,
      |  CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct_texts,
      |  min(doc_id) AS min_id, max(doc_id) AS max_id
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** [[graft.app.CorpusExport]]: shard documents 8 ways (portable md5
    * shard id), write the JSONL shards, publish the manifest. The
    * oracle re-derives shard membership and the order-free checksum
    * from the parquet table directly — green only if sharding AND the
    * per-shard digests are engine-reproducible (what lets a receiver
    * verify a shipped corpus without this library).
    */
  def exportManifest(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    val root = java.nio.file.Files.createTempDirectory("graft_export")
      .resolve("corpus").toString
    graft.app.CorpusExport.export(docs, "doc_id",
      Seq("doc_id", "text", "lang", "source", "n_chars"), root, nShards = 8)
  }

  val exportManifestSql: String =
    """WITH s AS (
      |  SELECT *, CAST(list_reduce(
      |    [strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), j, 1)) - 1
      |     for j in range(1, 9)], (a, x) -> a * 16 + x) % 8 AS INT) AS shard
      |  FROM documents),
      |f AS (
      |  SELECT shard,
      |    list_reduce([strpos('0123456789abcdef', substr(md5(
      |      concat_ws(chr(1),
      |        COALESCE(CAST(doc_id AS VARCHAR), chr(0)),
      |        COALESCE(text, chr(0)),
      |        COALESCE(lang, chr(0)),
      |        COALESCE(source, chr(0)),
      |        COALESCE(CAST(n_chars AS VARCHAR), chr(0)))
      |      ), j, 1)) - 1 for j in range(1, 16)],
      |      (a, x) -> a * 16 + x) AS fp
      |  FROM s)
      |SELECT shard, COUNT(*) AS n_docs,
      |       CAST(SUM(fp) % 1000000000000000000 AS BIGINT) AS checksum
      |FROM f GROUP BY shard ORDER BY shard""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ingest_parse"   -> (ingestParse _),
    "jsonl_roundtrip" -> (jsonlRoundtrip _),
    "csv_roundtrip"  -> (csvRoundtrip _),
    "export_manifest" -> (exportManifest _),
    "view_ilike"     -> (viewIlike _),
    "view_semi_join" -> (viewSemiJoin _))

  val oracleSql: Map[String, String] = Map(
    "ingest_parse"   -> ingestParseSql,
    "jsonl_roundtrip" -> jsonlRoundtripSql,
    "csv_roundtrip"  -> csvRoundtripSql,
    "export_manifest" -> exportManifestSql,
    "view_ilike"     -> viewIlikeSql,
    "view_semi_join" -> viewSemiJoinSql)
}
