package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Gate queries live in `graft.gates.*`, one object per operator family;
  * this object only aggregates them.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001: star join orders⋈customer
    * with grouped distinct/avg aggregates (the vw_top_companies shape,
    * reference sql/views/base_views.sql:82-96). Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val o = Tables(spark, dir, "orders")
    val c = Tables(spark, dir, "customer")
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"),
        Exact.davg(col("o_totalprice")).as("avg_price"))
      .orderBy(col("n_orders").desc, col("c_mktsegment"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    gates.CoreGates.queries ++ gates.FunctionGates.queries ++
      gates.ViewGates.queries ++ gates.LlmGates.queries ++
      gates.QualityGates.queries ++ gates.IngestGates.queries ++
      gates.ViewRealGates.queries ++ gates.PipelineGates.queries ++
      gates.CurationGates.queries ++ gates.TrainGates.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    gates.CoreGates.oracleSql ++ gates.FunctionGates.oracleSql ++
      gates.ViewGates.oracleSql ++ gates.LlmGates.oracleSql ++
      gates.QualityGates.oracleSql ++ gates.IngestGates.oracleSql ++
      gates.ViewRealGates.oracleSql ++ gates.PipelineGates.oracleSql ++
      gates.CurationGates.oracleSql ++ gates.TrainGates.oracleSql
}
