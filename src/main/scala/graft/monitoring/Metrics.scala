package graft.monitoring

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ETL/quality run metrics (monitoring schema) + the 2 monitoring views
  * (A10) and DWH stats (A11).
  *
  * Reference: `sql/schemas/monitoring_schema.sql:8-80`,
  * `src/monitoring/etl_metrics.py:15-38`, `dags/dwh_dag.py:138-201`.
  * Metrics rows append to a date-partitioned parquet table; dashboards
  * read the rollup views. At scale the rollups switch to
  * `approx_count_distinct` freely (monitoring is not a correctness
  * surface — SURVEY.md §2.4).
  */
object Metrics {

  val etlMetricsSchema: StructType = StructType(Seq(
    StructField("dag_id", StringType),
    StructField("task_id", StringType),
    StructField("execution_date", DateType),
    StructField("started_at", TimestampType),
    StructField("finished_at", TimestampType),
    StructField("duration_seconds", DoubleType),
    StructField("rows_in", LongType),
    StructField("rows_out", LongType),
    StructField("status", StringType),
    StructField("error_message", StringType),
    StructField("metadata", MapType(StringType, StringType))))

  val qualityMetricsSchema: StructType = StructType(Seq(
    StructField("validation_type", StringType),
    StructField("execution_date", DateType),
    StructField("recorded_at", TimestampType),
    StructField("total_jobs", LongType),
    StructField("valid_jobs", LongType),
    StructField("valid_rate", DoubleType),
    StructField("duplicate_rate", DoubleType),
    StructField("status", StringType)))

  def metricRow(dagId: String, taskId: String, executionDate: java.sql.Date,
                startedAt: java.sql.Timestamp, finishedAt: java.sql.Timestamp,
                rowsIn: Long, rowsOut: Long, status: String,
                error: Option[String] = None,
                metadata: Map[String, String] = Map.empty): Row =
    Row(dagId, taskId, executionDate, startedAt, finishedAt,
      (finishedAt.getTime - startedAt.getTime) / 1000.0,
      rowsIn, rowsOut, status, error.orNull, metadata)

  /** vw_pipeline_health (monitoring_schema.sql:58-68): per dag/task 7-day
    * rollup — success ratio, avg duration, avg rows, last run.
    */
  def pipelineHealth(etlMetrics: DataFrame, now: Column): DataFrame =
    etlMetrics
      .filter(col("started_at") >= date_sub(now.cast("date"), 7))
      .groupBy(col("dag_id"), col("task_id"))
      .agg(
        count(lit(1)).as("run_count"),
        round(count(when(col("status") === "success", 1)).cast("double") /
          count(lit(1)), 4).as("success_rate"),
        round(avg(col("duration_seconds")), 2).as("avg_duration_seconds"),
        round(avg(col("rows_out")), 1).as("avg_rows_out"),
        max(col("started_at")).as("last_run_at"))
      .orderBy(col("dag_id"), col("task_id"))

  /** vw_data_quality_trend (monitoring_schema.sql:70-80): daily quality
    * rates over the last 7 days.
    */
  def dataQualityTrend(qualityMetrics: DataFrame, now: Column): DataFrame =
    qualityMetrics
      .filter(col("recorded_at") >= date_sub(now.cast("date"), 7))
      .groupBy(col("execution_date"), col("validation_type"))
      .agg(
        round(avg(col("valid_rate")), 4).as("avg_valid_rate"),
        round(avg(col("duplicate_rate")), 4).as("avg_duplicate_rate"),
        sum(col("total_jobs")).as("total_jobs"),
        count(when(col("status") === "failed", 1)).as("failed_checks"))
      .orderBy(col("execution_date").desc, col("validation_type"))

  /** DWH stats (A11, dwh_dag.py:138-201): facts per date over the last 7
    * days + per-load-month rollups.
    */
  def dwhStats(fact: DataFrame, runDate: Column): DataFrame =
    fact.filter(col("date_id") >= date_sub(runDate.cast("date"), 7))
      .groupBy(col("date_id"))
      .agg(count(lit(1)).as("fact_count"),
        countDistinct(col("job_sk")).as("job_count"))
      .orderBy(col("date_id").desc)

  def loadMonthStats(fact: DataFrame): DataFrame =
    fact.groupBy(col("load_month"))
      .agg(count(lit(1)).as("fact_count"),
        countDistinct(col("job_sk")).as("job_count"),
        countDistinct(col("date_id")).as("day_count"))
      .orderBy(col("load_month").desc).limit(3)
}
