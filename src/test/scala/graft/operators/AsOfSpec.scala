package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, hour: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  private val quotes = Seq(
    (1L, ts(1), 10.0), (1L, ts(3), 30.0), (1L, ts(5), 50.0),
    (2L, ts(4), 99.0)).toDF("k", "ts", "px")

  test("backward as-of: most recent at-or-before, boundary inclusive") {
    val probes = Seq(
      (100L, 1L, ts(2)),  // between quotes 1 and 3 → 10.0
      (101L, 1L, ts(3)),  // exactly on quote 3 → inclusive → 30.0
      (102L, 1L, ts(9)),  // after all → 50.0
      (103L, 2L, ts(3)),  // before key-2's only quote → null
      (104L, 3L, ts(5)))  // key with no quotes at all → null
      .toDF("id", "k", "ts")
    val out = AsOf.join(probes, quotes, Seq("k"), "ts", "ts", Seq("px"),
        matchedTsCol = "qts")
      .orderBy("id")
      .select("id", "px").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    assert(out.toSeq == Seq(100L -> Some(10.0), 101L -> Some(30.0),
      102L -> Some(50.0), 103L -> None, 104L -> None))
  }

  test("strict mode excludes the equal-timestamp quote") {
    val probes = Seq((1L, 1L, ts(3))).toDF("id", "k", "ts")
    val incl = AsOf.join(probes, quotes, Seq("k"), "ts", "ts", Seq("px"))
      .select("px").head().getDouble(0)
    val strict = AsOf.join(probes, quotes, Seq("k"), "ts", "ts", Seq("px"),
        strict = true)
      .select("px").head().getDouble(0)
    assert(incl == 30.0 && strict == 10.0)
  }

  test("matched timestamp is surfaced and tolerance nulls stale matches") {
    val probes = Seq((1L, 1L, ts(9)), (2L, 1L, ts(5, 1))).toDF("id", "k", "ts")
    val out = AsOf.join(probes, quotes, Seq("k"), "ts", "ts", Seq("px"),
        matchedTsCol = "qts",
        tolerance = Some(expr("INTERVAL 1 DAY")))
      .orderBy("id").collect()
    // probe at day 9: last quote day 5 is 4 days stale → nulled
    assert(out(0).isNullAt(out(0).fieldIndex("qts")) &&
      out(0).isNullAt(out(0).fieldIndex("px")))
    // probe at day 5 01:00: quote day 5 00:00 within 1 day → kept
    assert(out(1).getAs[Timestamp]("qts") == ts(5) &&
      out(1).getAs[Double]("px") == 50.0)
  }

  test("plan: window is key-partitioned, one shuffle per side") {
    val probes = Seq((100L, 1L, ts(2))).toDF("id", "k", "ts")
    val plan = AsOf.join(probes, quotes, Seq("k"), "ts", "ts", Seq("px"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"))
    assert(!plan.toLowerCase.contains("cartesian"))
    // the window must be partitioned (no global single-partition sort)
    assert(plan.contains("partitionBy") || plan.contains("hashpartitioning"))
  }

  test("collision with left columns is rejected") {
    val probes = Seq((100L, 1L, ts(2), 5.0)).toDF("id", "k", "ts", "px")
    val e = intercept[IllegalArgumentException] {
      AsOf.join(probes, quotes, Seq("k"), "ts", "ts", Seq("px"))
    }
    assert(e.getMessage.contains("px"))
  }
}
