package graft.quality

import graft.SparkSpec
import graft.warehouse.WarehouseJob
import org.apache.spark.sql.Row

/** Runs every ODCS contract rule over the multi-day E2E warehouse state. */
class ContractsSpec extends SparkSpec {

  test("all contracts hold after a 2-day warehouse run") {
    import scala.jdk.CollectionConverters._
    def staging(rows: Seq[Row]) = spark.createDataFrame(
      new java.util.ArrayList[Row](rows.asJava), graft.warehouse.Schemas.staging)
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def row(id: String, title: String, loc: String): Row =
      Row(id, title, s"https://x/$id", Seq("Python"), "Công Ty Z",
        null, null, true, loc, null, null, "negotiable", null,
        ts("2026-01-01 06:00:00"), ts("2026-01-09 00:00:00"), ts("2026-01-01 06:00:00"))

    val s0 = WarehouseJob.emptyState(spark)
    val s1 = WarehouseJob.runDay(spark, s0,
      staging(Seq(row("p", "Dev", "Hà Nội"), row("q", "QA", "Huế"))), "2026-01-01")
    val s2 = WarehouseJob.runDay(spark, s1,
      staging(Seq(row("p", "Senior Dev", "Hà Nội"))), "2026-01-02")

    val results = Contracts.runAll(spark, s2.star,
      staging = Some(staging(Seq(row("p", "Senior Dev", "Hà Nội")))))
    val failures = results.filterNot(_.passed)
    assert(failures.isEmpty, failures.mkString("; "))
    assert(results.size == Contracts.rules.size)
  }
}
