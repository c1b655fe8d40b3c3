package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Round-trip through a real JDBC database (embedded Derby, which ships
  * with Spark) — proves the drop-in boundary source: write, single read,
  * partitioned read, pushed-down filter.
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val driver = Some("org.apache.derby.jdbc.EmbeddedDriver")

  test("JDBC round-trip: write, read back, partitioned read, filter pushdown") {
    val df = (1L to 100L).map(i => (i, s"job$i", (i % 7).toInt))
      .toDF("id", "title", "bucket")
    Jdbc.write(df, url, "staging_jobs", SaveMode.Overwrite, driver = driver)

    val back = Jdbc.read(spark, url, "staging_jobs", driver = driver)
    assert(back.count() == 100)
    assert(back.columns.map(_.toLowerCase).toSet == Set("id", "title", "bucket"))

    // partitioned read: 4 range slices over id, same content
    val part = Jdbc.readPartitioned(spark, url, "staging_jobs",
      "id", lower = 1L, upper = 100L, numPartitions = 4, driver = driver)
    assert(part.rdd.getNumPartitions == 4)
    assert(part.count() == 100)
    assert(part.agg(sum("id")).head().getLong(0) == 5050L)

    // filters reach the JDBC scan (PushedFilters in the v1 JDBC relation)
    val filtered = part.filter(col("bucket") === 3)
    val explained = filtered.queryExecution.executedPlan.toString
    assert(explained.contains("PushedFilters") && explained.contains("bucket"),
      s"filter not pushed:\n$explained")
    assert(filtered.count() == df.filter(col("bucket") === 3).count())
  }
}
