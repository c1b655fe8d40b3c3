package graft
import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1): times individual
  * declared queries OUTSIDE the full bench, dumps their
  * `.explain("formatted")` plans, and (optionally) a per-Spark-job
  * breakdown so a multi-job query (checkpoints, cap-stats fills,
  * iterative loops) shows WHERE its wall time goes.
  *
  * Usage: runMain graft.Probe <sfDir> <planDir|-> <name>[,<name>...]
  * Env:   SPARK_GRAFT_CPUS (default 32), PROBE_JOBS=1 for the job table,
  *        PROBE_TRIALS (default 2 — min-of-N published).
  *
  * NOT part of the bench contract: Bench.scala is untouched; this tool
  * exists so optimization work doesn't need a 25-minute full-bench run
  * per iteration. Timing method matches the bench (`.count()` on the
  * declared DataFrame) so numbers are comparable.
  */
object Probe {
  import scala.jdk.CollectionConverters._
  def main(args: Array[String]): Unit = {
    val Array(sfDir, planDir, namesCsv) = args.take(3)
    val names = namesCsv.split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val trials = sys.env.getOrElse("PROBE_TRIALS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // same warmup as the bench
    spark.range(1000000).selectExpr("sum(id)").collect()
    try {
      spark.read.parquet(s"$sfDir/embeddings.parquet").limit(256)
        .selectExpr("sum(aggregate(transform(embedding, x -> cast(x as double)), " +
          "cast(0.0 as double), (a, b) -> a + b))").collect()
    } catch { case _: Throwable => () }

    // per-job breakdown: jobId -> (description-or-callsite, seconds)
    val jobRows = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long, Long)]()
    val wantJobs = sys.env.get("PROBE_JOBS").contains("1")
    if (wantJobs) spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val desc = Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("")
          jobRows.put(js.jobId, (desc, js.time, 0L))
        }
        override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(jobRows.get(je.jobId)).foreach { case (d, s, _) =>
            jobRows.put(je.jobId, (d, s, je.time))
          }
        }
      })

    val out = scala.collection.mutable.LinkedHashMap[String, Double]()
    for (name <- names) SparkEntry.queries.get(name) match {
      case None => System.err.println(s"[probe] unknown query: $name")
      case Some(fn) =>
        if (planDir != "-") {
          val dir = java.nio.file.Paths.get(planDir)
          java.nio.file.Files.createDirectories(dir)
          val plan = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          java.nio.file.Files.writeString(dir.resolve(s"$name.txt"), plan)
        }
        jobRows.clear()
        spark.sparkContext.setJobDescription(s"probe:$name")
        val times = (1 to trials).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }
        spark.sparkContext.setJobDescription(null)
        out(name) = times.min
        if (wantJobs) {
          val rows = jobRows.asScala.toSeq.sortBy(_._1)
          System.err.println(s"[probe] $name jobs (all $trials trials):")
          rows.foreach { case (id, (d, s, e)) =>
            val dur = if (e > 0) (e - s) / 1e3 else -1.0
            System.err.println(f"[probe]   job $id%4d  $dur%8.3fs  $d")
          }
        }
        System.err.println(f"[probe] $name%-28s trials=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    println(out.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}"))
    spark.stop()
  }
}
