package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, hour: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  private val points = Seq(
    (1L, 1L, ts(2)), (2L, 1L, ts(3)), (3L, 1L, ts(8)),
    (4L, 2L, ts(3)), (5L, 2L, ts(20))).toDF("pid", "k", "t")
  private val intervals = Seq(
    (10L, 1L, ts(1), ts(3)),   // catches pids 1, 2 (end inclusive)
    (11L, 1L, ts(7), ts(9)),   // catches pid 3
    (12L, 2L, ts(1), ts(2)),   // catches nothing for key 2
    (13L, 3L, ts(1), ts(30)))  // key with no points
    .toDF("iid", "k", "lo", "hi")
  private val dayUs = 86400L * 1000000L

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("keyed: inclusive bounds, no phantom or missing matches") {
    val out = RangeJoin.pointInInterval(points, intervals, Seq("k"),
      "t", "lo", "hi", bucketWidth = dayUs)
    assert(pairs(out) == Set((1L, 10L), (2L, 10L), (3L, 11L)))
  }

  test("matches the naive theta join for every bucket width") {
    val naive = points.as("p").join(intervals.as("i"),
      col("p.k") === col("i.k") &&
        col("p.t").between(col("i.lo"), col("i.hi")))
    val expected = naive.select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (w <- Seq(3600L * 1000000L, dayUs, 40L * dayUs)) {
      val out = RangeJoin.pointInInterval(points, intervals, Seq("k"),
        "t", "lo", "hi", bucketWidth = w)
      assert(pairs(out) == expected, s"width $w diverges")
    }
  }

  test("unkeyed join buckets on the axis alone") {
    val out = RangeJoin.pointInInterval(points.drop("k"),
      intervals.drop("k"), Seq.empty, "t", "lo", "hi", bucketWidth = dayUs)
    // without the key, interval 13 spans everything and catches all
    // points; 10 additionally catches pid 4, 12 catches pid 1
    assert(pairs(out) == Set((1L, 10L), (2L, 10L), (4L, 10L), (3L, 11L),
      (1L, 12L), (1L, 13L), (2L, 13L), (3L, 13L), (4L, 13L), (5L, 13L)))
  }

  test("null axis rows and inverted intervals match nothing") {
    val p = Seq((1L, 1L, Some(ts(2))), (2L, 1L, None))
      .toDF("pid", "k", "t")
    val i = Seq(
      (10L, 1L, Some(ts(1)), Some(ts(3))),
      (11L, 1L, Some(ts(9)), Some(ts(1))),  // inverted
      (12L, 1L, None, Some(ts(3))))         // null start
      .toDF("iid", "k", "lo", "hi")
    val out = RangeJoin.pointInInterval(p, i, Seq("k"),
      "t", "lo", "hi", bucketWidth = dayUs)
    assert(pairs(out) == Set((1L, 10L)))
  }

  test("integral axis works without timestamp conversion") {
    val p = Seq((1L, 5L), (2L, 42L)).toDF("pid", "x")
    val i = Seq((10L, 0L, 10L), (11L, 40L, 50L)).toDF("iid", "lo", "hi")
    val out = RangeJoin.pointInInterval(p, i, Seq.empty,
      "x", "lo", "hi", bucketWidth = 7L)
    assert(pairs(out) == Set((1L, 10L), (2L, 11L)))
  }

  test("huge integral axis with tiny width buckets exactly (no DOUBLE loss)") {
    // 2^61-adjacent axis values: floor(axis / w) computed through DOUBLE
    // collapses adjacent buckets (2^61 ≫ 2^52 mantissa), silently losing
    // pairs. The long-arithmetic form must keep them exact.
    val base = 1L << 61
    val p = Seq((1L, base + 3L), (2L, base + 12L), (3L, base - 5L))
      .toDF("pid", "x")
    val i = Seq((10L, base + 0L, base + 9L), (11L, base + 10L, base + 19L),
      (12L, base - 9L, base - 1L)).toDF("iid", "lo", "hi")
    val out = RangeJoin.pointInInterval(p, i, Seq.empty,
      "x", "lo", "hi", bucketWidth = 10L)
    assert(pairs(out) == Set((1L, 10L), (2L, 11L), (3L, 12L)))
  }

  test("negative integral axis uses floor (not truncate-toward-zero) buckets") {
    val p = Seq((1L, -5L), (2L, -14L)).toDF("pid", "x")
    val i = Seq((10L, -10L, -1L), (11L, -20L, -11L)).toDF("iid", "lo", "hi")
    val out = RangeJoin.pointInInterval(p, i, Seq.empty,
      "x", "lo", "hi", bucketWidth = 10L)
    assert(pairs(out) == Set((1L, 10L), (2L, 11L)))
  }

  test("oversize interval raises by default (guard survives optimization)") {
    val p = Seq((1L, ts(2))).toDF("pid", "t")
    val i = Seq((10L, ts(1), ts(30))).toDF("iid", "lo", "hi")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(p, i, Seq.empty, "t", "lo", "hi",
        bucketWidth = 3600L * 1000000L, maxIntervalBuckets = 24).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("spans more than 24 buckets")), e.toString)
  }

  test("oversizeBroadcast routes giant intervals to the broadcast arm") {
    val out = RangeJoin.pointInInterval(points, intervals, Seq("k"),
      "t", "lo", "hi", bucketWidth = 3600L * 1000000L,
      maxIntervalBuckets = 24, oversizeBroadcast = true)
    // interval 13 (29 days ≫ 24 hour-buckets) goes to the broadcast arm
    // but matches nothing under key 3; the binned arm result is unchanged
    assert(pairs(out) == Set((1L, 10L), (2L, 10L), (3L, 11L)))
    val outHit = RangeJoin.pointInInterval(points,
      intervals.withColumn("k", when(col("iid") === 13, 2L).otherwise(col("k"))),
      Seq("k"), "t", "lo", "hi", bucketWidth = 3600L * 1000000L,
      maxIntervalBuckets = 24, oversizeBroadcast = true)
    assert(pairs(outHit) == Set((1L, 10L), (2L, 10L), (3L, 11L),
      (4L, 13L), (5L, 13L)))
  }

  test("plan: binned arm is a key-equi join, no cartesian") {
    val plan = RangeJoin.pointInInterval(points, intervals, Seq("k"),
        "t", "lo", "hi", bucketWidth = dayUs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    assert(!plan.contains("BroadcastNestedLoop"), plan.take(800))
  }
  private val lIvals = Seq(
    (1L, 1L, ts(2), ts(5)), (2L, 1L, ts(10), ts(12)),
    (3L, 2L, ts(1), ts(2))).toDF("lid", "k", "ls", "le")
  private val rIvals = Seq(
    (10L, 1L, ts(4), ts(11)),   // overlaps 1 and 2
    (11L, 1L, ts(6), ts(9)),    // between them, overlaps neither
    (12L, 2L, ts(2), ts(3)),    // touches 3 at the bound (inclusive)
    (13L, 3L, ts(1), ts(30)))   // key with no left rows
    .toDF("rid", "k", "rs", "re")

  test("intervalOverlap equals the naive overlap theta join at every width") {
    val naive = lIvals.as("l").join(rIvals.as("r"),
      col("l.k") === col("r.k") &&
        col("l.ls") <= col("r.re") && col("r.rs") <= col("l.le"))
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive == Set((1L, 10L), (2L, 10L), (3L, 12L)))
    for (w <- Seq(3600L * 1000000L, dayUs, 40L * dayUs)) {
      val out = RangeJoin.intervalOverlap(lIvals, rIvals, Seq("k"),
        "ls", "le", "rs", "re", bucketWidth = w)
      val got = out.select("lid", "rid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == naive, s"width $w diverges")
      // each pair exactly once — the meeting-bucket dedup is structural
      assert(out.count() == naive.size.toLong, s"width $w duplicates")
    }
  }

  test("intervalOverlap: inverted spans match nothing, oversize raises") {
    val inv = Seq((9L, 1L, ts(9), ts(2))).toDF("lid", "k", "ls", "le")
    assert(RangeJoin.intervalOverlap(inv, rIvals, Seq("k"),
      "ls", "le", "rs", "re", bucketWidth = dayUs).count() == 0L)
    val e = intercept[Exception] {
      RangeJoin.intervalOverlap(lIvals, rIvals, Seq("k"),
        "ls", "le", "rs", "re", bucketWidth = 3600L * 1000000L,
        maxIntervalBuckets = 4).count()
    }
    assert(e.getMessage != null)
  }
}
