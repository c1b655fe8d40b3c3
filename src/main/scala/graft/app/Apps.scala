package graft.app

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{Cleaners, Hashes, Salary}
import graft.ingest.HtmlParser
import graft.monitoring.Metrics
import graft.operators.Merge
import graft.quality.{QualityGate, Validators}
import graft.storage.TableStore
import graft.views.{Star, Views}
import graft.warehouse.WarehouseJob
import scala.jdk.CollectionConverters._

/** DAG-equivalent entry points (SURVEY.md §3): each app is the Spark
  * counterpart of one reference Airflow DAG, wired over the parquet table
  * layer. Layout under a warehouse root:
  *
  * {{{
  *   <root>/raw_jobs/            (full snapshot)
  *   <root>/staging_jobs/        crawl_date=YYYY-MM-DD/   (partitioned)
  *   <root>/dwh/<DimX|Fact...>/  facts partitioned by date_id
  *   <root>/archive/raw_jobs/    year=YYYY/month=MM/
  * }}}
  */
object Apps {

  /** `jobinsight_pipeline` (§3.1): HTML batch → parse → validate+gate →
    * raw merge → staging transform → validate+gate. Returns the staging
    * slice it wrote. Each run appends one `etl_metrics` row and one
    * `quality_metrics` row under `<root>/monitoring/` (success OR
    * failure — the reference's DAG-callback instrumentation), which the
    * served `vw_pipeline_health` / `vw_data_quality_trend` roll up.
    */
  def runIngestDay(spark: SparkSession, htmlDir: String, warehouseRoot: String,
                   runDate: String): DataFrame =
    Metrics.instrument(spark, warehouseRoot, "jobinsight_pipeline",
      "ingest_transform", runDate) {
      ingestDayBody(spark, htmlDir, warehouseRoot, runDate)
    }

  private def ingestDayBody(spark: SparkSession, htmlDir: String,
                            warehouseRoot: String,
                            runDate: String): (DataFrame, Long, Long) = {
    val pages = spark.read.option("wholetext", "true").text(htmlDir)
      .withColumnRenamed("value", "html")
    val jobs = HtmlParser.parseJobs(pages)
      .dropDuplicates("job_id") // DAG-level re-dedup (pipeline_dag.py:113-114)

    val crawlStats = Validators.crawlStats(jobs).head()
    Metrics.recordQuality(spark, warehouseRoot, "crawl",
      java.sql.Date.valueOf(runDate),
      new java.sql.Timestamp(System.currentTimeMillis()),
      crawlStats.getAs[Long]("total_jobs"), crawlStats.getAs[Long]("valid_jobs"),
      crawlStats.getAs[Double]("valid_rate"),
      crawlStats.getAs[Double]("duplicate_rate"),
      if (crawlStats.getAs[Double]("valid_rate") >= 0.9) "passed" else "failed")
    QualityGate.evaluate(crawlStats, QualityGate.crawlConfig)

    // Raw merge (S5/M8) over the snapshot table.
    val rawPath = s"$warehouseRoot/raw_jobs"
    val incoming = jobs.withColumn("crawled_at",
      lit(runDate + " 06:00:00").cast("timestamp"))
    val existing = readOrEmpty(spark, rawPath, incoming)
    val merged = Merge.upsert(existing, incoming,
      key = Seq("job_id"),
      tracked = Seq("title", "company_name", "salary", "location", "deadline",
        "verified_employer"))
      .drop(Merge.ClassCol)
    TableStore.writeSnapshot(merged, rawPath)

    // Staging transform (F1–F8 projection, staging_procedures.sql).
    val crawledAt = lit(runDate + " 06:00:00").cast("timestamp")
    val sal = Salary.normalizeSalary(col("salary"))
    val due = Salary.dueDate(crawledAt, col("deadline"))
    val staging = spark.read.parquet(rawPath).select(
      col("job_id"),
      Cleaners.cleanTitle(col("title")).as("title_clean"),
      col("job_url"),
      col("skills"),
      Cleaners.cleanCompanyName(col("company_name")).as("company_name_standardized"),
      col("company_url"),
      col("logo_url"),
      col("verified_employer"),
      col("location"),
      sal.getField("salary_min").as("salary_min"),
      sal.getField("salary_max").as("salary_max"),
      sal.getField("salary_type").as("salary_type"),
      Salary.timeRemaining(due, crawledAt).as("time_remaining"),
      graft.functions.LastUpdate.postedTime(col("last_update"), crawledAt).as("posted_time"),
      due.as("due_date"),
      crawledAt.as("crawled_at"))
      .withColumn("crawl_date", lit(runDate))
    TableStore.replacePartitions(staging, s"$warehouseRoot/staging_jobs", Seq("crawl_date"))

    val stagingStats = Validators.stagingStats(staging).head()
    QualityGate.evaluate(stagingStats, QualityGate.stagingConfig)
    (staging.drop("crawl_date"),
      crawlStats.getAs[Long]("total_jobs"),
      stagingStats.getAs[Long]("total_jobs"))
  }

  /** `jobinsight_dwh` (§3.2): read today's staging partition
    * (partition-pruned, S4), run the warehouse day, write dims as
    * snapshots and fact/bridge with dynamic partition overwrite.
    * `onStage` receives the per-stage wall times from
    * [[WarehouseJob.runDay]] plus a final `writes` stage covering the
    * snapshot/partition writes — the composite's regression localizer.
    */
  def runWarehouseDay(spark: SparkSession, warehouseRoot: String,
                      runDate: String,
                      onStage: (String, Double) => Unit = (_, _) => (),
                      pin: Boolean = false): Unit = {
    Metrics.instrument(spark, warehouseRoot, "jobinsight_dwh", "load_dwh",
      runDate) {
      val staging = spark.read.parquet(s"$warehouseRoot/staging_jobs")
        .filter(col("crawl_date") === runDate)   // partition pruning, S4/P10
        .drop("crawl_date")

      val state = WarehouseJob.State(readStar(spark, warehouseRoot))
      // checkpoint = true: materialize results BEFORE the writes below
      // replace the very files their plans read from.
      val next = WarehouseJob.runDay(spark, state, staging, runDate,
        checkpoint = true, onStage = onStage)

      val tWrites = System.nanoTime()
      val dwh = s"$warehouseRoot/dwh"
      TableStore.writeSnapshot(next.star.dimJob, s"$dwh/DimJob")
      TableStore.writeSnapshot(next.star.dimCompany, s"$dwh/DimCompany")
      TableStore.writeSnapshot(next.star.dimLocation, s"$dwh/DimLocation")
      TableStore.writeSnapshot(next.star.dimDate, s"$dwh/DimDate")
      // Day-run rewrites only today's date_id partition.
      val todaysFact = next.star.fact
        .filter(col("date_id") === lit(runDate).cast("date"))
      TableStore.replacePartitions(
        todaysFact, s"$dwh/FactJobPostingDaily", Seq("date_id"))
      TableStore.writeSnapshot(next.star.bridge, s"$dwh/FactJobLocationBridge")
      onStage("writes", (System.nanoTime() - tWrites) / 1e9)
      // counts on checkpointed frames — no plan re-execution
      ((), staging.count(), todaysFact.count())
    }
    if (pin) pinWarehouse(spark, warehouseRoot, runDate)
  }

  // ---- Late-data correction: pinned snapshots + bounded replay ---------

  private val PinTables = Seq("DimJob", "DimCompany", "DimLocation",
    "DimDate", "FactJobPostingDaily", "FactJobLocationBridge")

  /** Pin the on-disk star as an immutable end-of-`runDate` snapshot:
    * each table [[graft.storage.Versioned.write]]n under
    * `<root>/pins/<table>/`, then a `day=<runDate>.pin` manifest
    * (table=version lines) written LAST — the manifest is the day
    * pin's commit marker, same write-then-publish invariant as the
    * Versioned pointer itself. Pins are what turn a late-arriving row
    * for a CLOSED day from "rebuild the warehouse from day zero" into
    * the bounded [[rebuildFromDay]] replay.
    */
  def pinWarehouse(spark: SparkSession, warehouseRoot: String,
                   runDate: String): Unit = {
    val star = readStar(spark, warehouseRoot)
    val dfs = Map(
      "DimJob" -> star.dimJob, "DimCompany" -> star.dimCompany,
      "DimLocation" -> star.dimLocation, "DimDate" -> star.dimDate,
      "FactJobPostingDaily" -> star.fact,
      "FactJobLocationBridge" -> star.bridge)
    val lines = PinTables.map { t =>
      t + "=" + graft.storage.Versioned.write(dfs(t),
        s"$warehouseRoot/pins/$t")
    }
    // Publish the manifest atomically (temp file + ATOMIC_MOVE, the same
    // write-then-publish as the Versioned pointer): a crash mid-write
    // must never leave a truncated day=<date>.pin that [[pinnedDays]]
    // would treat as committed and [[rebuildFromDay]] would choke on.
    val pinPath =
      java.nio.file.Paths.get(s"$warehouseRoot/pins/day=$runDate.pin")
    val tmp = java.nio.file.Files.createTempFile(
      pinPath.getParent, s"day=$runDate", ".pin.tmp")
    java.nio.file.Files.writeString(tmp, lines.mkString("\n"))
    java.nio.file.Files.move(tmp, pinPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Committed pin days (ascending ISO dates — lexicographic =
    * temporal). Defense in depth behind [[pinWarehouse]]'s atomic
    * publish: a manifest that does not parse (every [[PinTables]] key
    * present with a long version) is skipped rather than surfaced, so
    * a damaged pin can never block [[rebuildFromDay]] — the rebuild
    * just falls back to the previous (or no) pin.
    */
  def pinnedDays(warehouseRoot: String): Seq[String] = {
    val p = java.nio.file.Paths.get(s"$warehouseRoot/pins")
    if (!java.nio.file.Files.exists(p)) return Nil
    val s = java.nio.file.Files.list(p)
    def parses(day: String): Boolean =
      try {
        val versions = java.nio.file.Files.readString(
            p.resolve(s"day=$day.pin")).linesIterator
          .filter(_.contains("=")).map { l =>
            val Array(t, v) = l.split("=", 2); (t, v.trim.toLong)
          }.toMap
        PinTables.forall(versions.contains)
      } catch { case scala.util.control.NonFatal(_) => false }
    try s.iterator().asScala.toList.map(_.getFileName.toString)
      .collect { case n if n.startsWith("day=") && n.endsWith(".pin") =>
        n.stripPrefix("day=").stripSuffix(".pin") }
      .filter(parses)
      .sorted
    finally s.close()
  }

  /** Staged days on disk (`crawl_date=` partition directories, ascending). */
  def stagedDays(warehouseRoot: String): Seq[String] = {
    val p = java.nio.file.Paths.get(s"$warehouseRoot/staging_jobs")
    if (!java.nio.file.Files.exists(p)) return Nil
    val s = java.nio.file.Files.list(p)
    try s.iterator().asScala.toList.map(_.getFileName.toString)
      .collect { case n if n.startsWith("crawl_date=") =>
        n.stripPrefix("crawl_date=") }
      .sorted
    finally s.close()
  }

  /** Restore the on-disk dwh from the `day` pin manifest: the whole
    * `<root>/dwh` is replaced wholesale (stale fact partitions from the
    * overwritten timeline must not linger), dims/bridge as snapshots,
    * the fact re-laid date_id-partitioned.
    */
  private def restorePin(spark: SparkSession, warehouseRoot: String,
                         day: String): Unit = {
    val manifest = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$warehouseRoot/pins/day=$day.pin"))
    val versions: Map[String, Long] = manifest.linesIterator
      .filter(_.contains("=")).map { l =>
        val Array(t, v) = l.split("=", 2); (t, v.trim.toLong)
      }.toMap
    TableStore.deleteRecursively(
      java.nio.file.Paths.get(s"$warehouseRoot/dwh"))
    def pinned(t: String): DataFrame =
      graft.storage.Versioned.read(spark, s"$warehouseRoot/pins/$t",
        versions(t))
    val dwh = s"$warehouseRoot/dwh"
    Seq("DimJob", "DimCompany", "DimLocation", "DimDate",
        "FactJobLocationBridge")
      .foreach(t => TableStore.writeSnapshot(pinned(t), s"$dwh/$t"))
    val fact = pinned("FactJobPostingDaily")
    if (!fact.isEmpty)
      TableStore.replacePartitions(fact, s"$dwh/FactJobPostingDaily",
        Seq("date_id"))
  }

  /** LATE-DATA CORRECTION (§2.10's "late rows for a closed day =
    * snapshot rebuild", now an operator): after staging partitions ≤
    * some already-run `fromDay` changed, restore the newest pin
    * STRICTLY BEFORE `fromDay` and replay every staged day after that
    * pin through the REAL [[runWarehouseDay]] — the rebuilt warehouse
    * equals the from-scratch run over the corrected staging (RebuildSpec
    * pins the equality). With no eligible pin, the dwh resets to empty
    * and the whole timeline replays (the documented unbounded
    * fallback). Returns the replayed days.
    *
    * Scale bound: cost = (#days after the newest pin < fromDay) ×
    * one day-run — pin cadence directly caps the replay window, so a
    * daily-pinned warehouse corrects any single late day in ≤ 2
    * day-runs. Each replayed day re-appends its monitoring rows (a
    * rerun IS a run; the health views see the correction).
    */
  def rebuildFromDay(spark: SparkSession, warehouseRoot: String,
                     fromDay: String,
                     pin: Boolean = false): Seq[String] = {
    val base = pinnedDays(warehouseRoot).filter(_ < fromDay).lastOption
    base match {
      case Some(d) => restorePin(spark, warehouseRoot, d)
      case None => TableStore.deleteRecursively(
        java.nio.file.Paths.get(s"$warehouseRoot/dwh"))
    }
    val replay = stagedDays(warehouseRoot)
      .filter(d => base.forall(_ < d))
    replay.foreach(d => runWarehouseDay(spark, warehouseRoot, d, pin = pin))
    replay
  }

  /** Read the star schema back from disk (empty frames before day 1). */
  def readStar(spark: SparkSession, warehouseRoot: String): Star = {
    val dwh = s"$warehouseRoot/dwh"
    val empty = WarehouseJob.emptyState(spark).star
    Star(
      dimJob = readOrEmpty(spark, s"$dwh/DimJob", empty.dimJob),
      dimCompany = readOrEmpty(spark, s"$dwh/DimCompany", empty.dimCompany),
      dimLocation = if (exists(s"$dwh/DimLocation"))
        spark.read.parquet(s"$dwh/DimLocation") else empty.dimLocation,
      dimDate = readOrEmpty(spark, s"$dwh/DimDate", empty.dimDate),
      fact = readOrEmpty(spark, s"$dwh/FactJobPostingDaily", empty.fact)
        .select(empty.fact.columns.toIndexedSeq.map(col): _*), // partition col read-back order
      bridge = readOrEmpty(spark, s"$dwh/FactJobLocationBridge", empty.bridge))
  }

  /** `jobinsight_archive` + maintenance (§3 secondary): archive old raw
    * rows (oldest-first export, O5) then retention-delete them.
    */
  def runArchive(spark: SparkSession, warehouseRoot: String, runDate: String,
                 retentionDays: Int = 30): Long = {
    val rawPath = s"$warehouseRoot/raw_jobs"
    if (!exists(rawPath)) return 0L
    Metrics.instrument(spark, warehouseRoot, "jobinsight_archive",
      "archive_delete", runDate) {
      val raw = spark.read.parquet(rawPath)
      val cutoff = date_sub(lit(runDate).cast("date"), retentionDays).cast("timestamp")
      val archived = TableStore.archiveOlderThan(
        raw.orderBy(col("crawled_at").asc), col("crawled_at"), cutoff,
        s"$warehouseRoot/archive/raw_jobs")
      val n = archived.count()
      if (n > 0) {
        val expected = spark.read.parquet(s"$warehouseRoot/archive/raw_jobs")
          .filter(col("crawled_at") < cutoff).count()
        require(expected >= n, s"archive verify failed: $expected < $n") // S7
        TableStore.retentionDelete(spark, rawPath, archived.select("job_id"), Seq("job_id"))
      }
      (n, n, n)
    }
  }

  /** Denormalized fact export (J11 + S6: `minio.py:231-237` enrichment
    * join, `:253-308` load_month-partitioned layout): fact ⋈ DimJob ⋈
    * DimCompany, snappy parquet under `parquet/load_month=YYYY-MM/`.
    */
  def exportDenormalized(spark: SparkSession, warehouseRoot: String): Unit =
    TableStore.replacePartitions(
      denormalized(readStar(spark, warehouseRoot)),
      s"$warehouseRoot/parquet/job_postings", Seq("load_month"))

  /** The export's enrichment join, star in → denormalized rows out —
    * shared by [[exportDenormalized]] and the `export_denorm` gate so the
    * oracle verifies the REAL export plan, not an analogue.
    */
  def denormalized(star: graft.views.Star): DataFrame =
    star.fact.as("f")
      .join(broadcast(star.dimJob.filter(col("is_current"))).as("j"),
        col("f.job_sk") === col("j.job_sk"))
      .join(broadcast(star.dimCompany.filter(col("is_current"))).as("c"),
        col("f.company_sk") === col("c.company_sk"))
      .select(col("f.fact_id"), col("j.job_id"), col("j.title"),
        col("c.company_name"), col("c.verified_employer"), col("f.date_id"),
        col("f.salary_min"), col("f.salary_max"), col("f.salary_type"),
        col("f.due_date"), col("f.posted_time"), col("j.skills"),
        col("j.job_url"), col("f.load_month"))

  /** Register the BI surface (§3.3). */
  def registerViews(spark: SparkSession, warehouseRoot: String, runDate: String): Unit =
    Views.registerAll(spark, readStar(spark, warehouseRoot), lit(runDate))

  private def exists(path: String): Boolean =
    java.nio.file.Files.exists(java.nio.file.Paths.get(path))

  private def readOrEmpty(spark: SparkSession, path: String, like: DataFrame): DataFrame =
    if (exists(path)) spark.read.parquet(path) else like.limit(0)
}
