package graft.app

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.hive.thriftserver.HiveThriftServer2
import org.apache.hive.service.server.HiveServer2
import graft.views.Views

/** Entry point 3 — the BI serving endpoint (SURVEY §3.3).
  *
  * The reference's analytics surface is Superset speaking SQL to the
  * warehouse over a socket (reference `docker-compose.yml` wires
  * superset → postgres; the views it queries are
  * `sql/views/base_views.sql:11`, `business_views.sql:14`). The Spark
  * counterpart is the HiveServer2 Thrift protocol: any hive-jdbc /
  * pyhive / Superset / Tableau client connects to
  * `jdbc:hive2://host:port/default` and queries the 15-view catalog
  * plus the star-schema base tables under the `global_temp` schema
  * (`SELECT … FROM global_temp.vw_current_jobs`).
  *
  * The catalog is registered as GLOBAL temp views (queryable as
  * `global_temp.vw_…`), so every JDBC connection — each of which forks
  * its own session — sees the same catalog while staying isolated: a
  * client's `SET x=y` (and the conf the Thrift session manager itself
  * flips at open, `spark.sql.datetime.java8API.enabled`) lands on that
  * client's forked session, never on the session the server was
  * started from. (The `singleSession=true` alternative shares the
  * parent session and with it every such mutation.)
  */
object ServeApp {

  /** Names under which the star base tables are served, Superset-parity
    * with the reference's `jobinsight` warehouse schema (`dwh` tables).
    */
  private val starTables = Seq("DimJob", "DimCompany", "DimLocation",
    "DimDate", "FactJobPostingDaily", "FactJobLocationBridge")

  /** Register the serving catalog: the 15 analytic views plus the six
    * star base tables, all as GLOBAL temp views — visible to every
    * session forked from `spark`'s context under the `global_temp`
    * database.
    */
  def registerCatalog(spark: SparkSession, warehouseRoot: String,
                      runDate: String): Unit = {
    val star = Apps.readStar(spark, warehouseRoot)
    Seq(star.dimJob, star.dimCompany, star.dimLocation, star.dimDate,
      star.fact, star.bridge).zip(starTables).foreach {
      case (df, name) => df.createOrReplaceGlobalTempView(name)
    }
    // Views.registerAll registers session-local names (the in-process
    // surface); republish each under global_temp for served clients.
    Views.registerAll(spark, star, lit(runDate))
    val reg = spark.catalog.listTables()
      .filter(col("isTemporary")).select("name").collect().map(_.getString(0))
    reg.filter(_.startsWith("vw_")).foreach { v =>
      spark.table(v).createOrReplaceGlobalTempView(v)
    }
    // the 2 monitoring views (Grafana parity: reference
    // monitoring_schema.sql:58-80) — served whenever the apps have
    // recorded run metrics under <root>/monitoring/
    val mon = Seq(
      ("etl_metrics", "vw_pipeline_health",
        (df: org.apache.spark.sql.DataFrame) =>
          graft.monitoring.Metrics.pipelineHealth(df, lit(runDate))),
      ("quality_metrics", "vw_data_quality_trend",
        (df: org.apache.spark.sql.DataFrame) =>
          graft.monitoring.Metrics.dataQualityTrend(df, lit(runDate))))
    mon.foreach { case (table, view, build) =>
      val path = s"$warehouseRoot/monitoring/$table"
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(path))) {
        val v = build(spark.read.parquet(path))
        v.createOrReplaceTempView(view)
        v.createOrReplaceGlobalTempView(view)
      }
    }
  }

  /** Register the catalog and start the Thrift endpoint on `port`
    * (localhost bind; pass `bindHost` to expose it). Returns the server
    * handle — callers own its lifecycle (`stop()`). Typed as the public
    * `HiveServer2` supertype: Spark's `HiveThriftServer2` class itself
    * is `private[hive]`.
    */
  def start(spark: SparkSession, warehouseRoot: String, runDate: String,
            port: Int, bindHost: String = "localhost"): HiveServer2 = {
    registerCatalog(spark, warehouseRoot, runDate)
    // Session-conf entries flow into the HiveConf the server snapshots
    // at init (sessionState.newHadoopConf copies SQL conf settings).
    spark.sqlContext.setConf("hive.server2.thrift.port", port.toString)
    spark.sqlContext.setConf("hive.server2.thrift.bind.host", bindHost)
    HiveThriftServer2.startWithSparkSession(spark, exitOnError = false)
  }

  /** `ServeApp <warehouseRoot> <runDate> [port] [bindHost]` — serves the
    * catalog until killed.
    */
  def main(args: Array[String]): Unit = {
    val root = args.lift(0).getOrElse("warehouse")
    val runDate = args.lift(1).getOrElse(
      java.time.LocalDate.now(java.time.ZoneOffset.UTC).toString)
    val port = args.lift(2).map(_.toInt).getOrElse(10000)
    val bindHost = args.lift(3).getOrElse("localhost")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .appName("graft-serve")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    start(spark, root, runDate, port, bindHost)
    val nViews = spark.catalog.listTables("global_temp")
      .filter(col("name").startsWith("vw_")).count()
    println(s"""{"endpoint":"jdbc:hive2://$bindHost:$port/default","views":$nViews,"tables":${starTables.size}}""")
    Thread.currentThread().join() // serve until the process is killed
  }
}
