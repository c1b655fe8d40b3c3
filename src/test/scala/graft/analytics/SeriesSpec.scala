package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Date

class SeriesSpec extends SparkSpec {
  import spark.implicits._

  private def d(day: Int): Date = Date.valueOf(f"2024-01-$day%02d")

  test("gap fill: spine per key, forward fill, observed flags") {
    val df = Seq(
      ("a", d(1), Some(10L), Some(1.5)),
      ("a", d(4), Some(40L), None),       // day 4 observes n but not v
      ("b", d(3), Some(30L), Some(3.0)))
      .toDF("k", "day", "n", "v")
    val out = Series.gapFillDaily(df, Seq("k"), "day", Seq("n", "v"))
      .orderBy("k", "day")
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString.takeRight(2),
        Option(r.get(2)), Option(r.get(3)), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      ("a", "01", Some(10L), Some(1.5), true),
      ("a", "02", Some(10L), Some(1.5), false),  // both carried
      ("a", "03", Some(10L), Some(1.5), false),
      ("a", "04", Some(40L), Some(1.5), true),   // n updates, v carries
      ("b", "03", Some(30L), Some(3.0), true)))  // single-day key: no gaps
  }

  test("values before a key's first observation stay null") {
    val df = Seq(
      ("a", d(1), Option.empty[Long]),
      ("a", d(3), Some(5L)))
      .toDF("k", "day", "n")
    val out = Series.gapFillDaily(df, Seq("k"), "day", Seq("n"))
      .orderBy("day").collect()
      .map(r => (Option(r.get(2)), r.getBoolean(3)))
    assert(out.toSeq == Seq((None, true), (None, false), (Some(5L), true)))
  }

  test("plan: fill window is key-partitioned") {
    import org.apache.spark.sql.execution.window.WindowExec
    val df = Seq(("a", d(1), 1L)).toDF("k", "day", "n")
    val ws = Series.gapFillDaily(df, Seq("k"), "day", Seq("n"))
      .queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(ws.nonEmpty && ws.forall(_.partitionSpec.nonEmpty))
  }
}
