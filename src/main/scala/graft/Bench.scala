package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line on stdout. A failing query is reported
  * as an `errors` entry and EXCLUDED from `queries`/total, so a broken
  * query can never masquerade as a fast one.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"
                  case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString }

    // JIT/codegen warmup so the alphabetically-first query doesn't absorb
    // JVM startup cost into its measurement: exercise codegen, the
    // parquet reader, and the interpreted higher-order-function path the
    // ANN/dedup queries use.
    spark.range(1000000).selectExpr("sum(id)").collect()
    try {
      spark.read.parquet(s"$sfDir/embeddings.parquet").limit(256)
        .selectExpr("sum(aggregate(transform(embedding, x -> cast(x as double)), " +
          "cast(0.0 as double), (a, b) -> a + b))").collect()
    } catch { case _: Throwable => () }

    val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
    val errors  = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        timings(name) = (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
      }
    }
    val qs = timings.map { case (k, v) => "\"" + esc(k) + "\":" + v }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => "\"" + esc(k) + "\":\"" + esc(v) + "\"" }.mkString("{", ",", "}")
    val total = if (timings.nonEmpty) timings.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"sf":"${esc(sfDir)}"}""")
    spark.stop()
  }
}
