package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private def ts(d: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")

  private val rows = Seq(
    (1L, 10.10, ts(1)), (1L, 20.25, ts(5)), (1L, 0.65, ts(3)),
    (2L, 99.99, ts(2)),
    (3L, 5.00, ts(4)), (3L, 5.00, ts(6)), (3L, 7.50, ts(1)))
    .toDF("k", "amount", "ts")

  private val spec = IncrementalAgg.Spec(
    sumCols = Seq("amount"), minCols = Seq("ts"), maxCols = Seq("ts"),
    avgOf = Seq("amount"))

  private def fin(st: DataFrame) =
    IncrementalAgg.finish(st, Seq("k"), spec)
      .orderBy("k").collect().toSeq

  test("merge of slice states equals the from-scratch state (identity)") {
    val whole = IncrementalAgg.state(rows, Seq("k"), spec)
    val a = IncrementalAgg.state(rows.filter($"ts" < ts(4)), Seq("k"), spec)
    val b = IncrementalAgg.state(rows.filter($"ts" >= ts(4)), Seq("k"), spec)
    assert(fin(IncrementalAgg.merge(Seq(a, b), Seq("k"), spec)) == fin(whole))
  }

  test("merge is order-independent and associative across generations") {
    val s1 = IncrementalAgg.state(rows.filter($"ts" <= ts(2)), Seq("k"), spec)
    val s2 = IncrementalAgg.state(
      rows.filter($"ts" > ts(2) && $"ts" <= ts(4)), Seq("k"), spec)
    val s3 = IncrementalAgg.state(rows.filter($"ts" > ts(4)), Seq("k"), spec)
    val leftFold = IncrementalAgg.merge(
      Seq(IncrementalAgg.merge(Seq(s1, s2), Seq("k"), spec), s3), Seq("k"), spec)
    val reversed = IncrementalAgg.merge(Seq(s3, s2, s1), Seq("k"), spec)
    assert(fin(leftFold) == fin(reversed))
    assert(fin(leftFold) == fin(IncrementalAgg.state(rows, Seq("k"), spec)))
  }

  test("finish publishes exact sums and the derived average") {
    val out = fin(IncrementalAgg.state(rows, Seq("k"), spec))
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getAs[Timestamp]("min_ts"), r.getAs[Timestamp]("max_ts"),
        r.getDouble(5)))
    assert(out(0) == ((1L, 3L, 31.00, ts(1), ts(5), 31.00 / 3)))
    assert(out(1) == ((2L, 1L, 99.99, ts(2), ts(2), 99.99)))
    assert(out(2) == ((3L, 3L, 17.50, ts(1), ts(6), 17.50 / 3)))
  }

  test("changelog apply: retractions maintain the view exactly") {
    val sumSpec = IncrementalAgg.Spec(
      sumCols = Seq("amount"), avgOf = Seq("amount"))
    val prior = IncrementalAgg.state(rows.drop("ts"), Seq("k"), sumSpec)
    // key 1: one row re-priced 10.10 -> 12.00; key 2: row deleted;
    // key 4: brand-new row
    val changelog = Seq(
      (1L, 10.10, "retract"), (1L, 12.00, "upsert"),
      (2L, 99.99, "retract"),
      (4L, 1.25, "upsert"))
      .toDF("k", "amount", "_change")
    val next = IncrementalAgg.applyChangelog(prior, changelog, Seq("k"), sumSpec)
    val finalTable = Seq(
      (1L, 12.00), (1L, 20.25), (1L, 0.65),
      (3L, 5.00), (3L, 5.00), (3L, 7.50),
      (4L, 1.25)).toDF("k", "amount")
    val fromScratch = IncrementalAgg.state(finalTable, Seq("k"), sumSpec)
    def finSum(st: DataFrame) = IncrementalAgg.finish(st, Seq("k"), sumSpec)
      .filter($"cnt" > 0).orderBy("k").collect().toSeq
    assert(finSum(next) == finSum(fromScratch))
    // the fully-cancelled key survives as a zero-count state row
    assert(IncrementalAgg.finish(next, Seq("k"), sumSpec)
      .filter($"k" === 2L).head().getLong(1) == 0L)
  }

  test("changelog rebuild: min/max recover exactly, only retracted keys rescanned") {
    val prior = IncrementalAgg.state(rows, Seq("k"), spec)
    // key 1: the MIN-ts row retracted (runner-up must surface); key 2:
    // fully deleted; key 3: upsert-only (algebraic path); key 4: new
    val changelog = Seq(
      (1L, 10.10, ts(1), "retract"),
      (2L, 99.99, ts(2), "retract"),
      (3L, 1.00, ts(7), "upsert"),
      (4L, 1.25, ts(2), "upsert"))
      .toDF("k", "amount", "ts", "_change")
    val current = Seq(
      (1L, 20.25, ts(5)), (1L, 0.65, ts(3)),
      (3L, 5.00, ts(4)), (3L, 5.00, ts(6)), (3L, 7.50, ts(1)), (3L, 1.00, ts(7)),
      (4L, 1.25, ts(2))).toDF("k", "amount", "ts")
    val next = IncrementalAgg.applyChangelogRebuild(
      prior, changelog, current, Seq("k"), spec)
    val fromScratch = IncrementalAgg.state(current, Seq("k"), spec)
    def live(st: DataFrame) = IncrementalAgg.finish(st, Seq("k"), spec)
      .filter($"cnt" > 0).orderBy("k").collect().toSeq
    assert(live(next) == live(fromScratch))
    // key 1's min moved off the retracted row: runner-up ts(3) surfaced
    assert(IncrementalAgg.finish(next, Seq("k"), spec)
      .filter($"k" === 1L).head().getAs[Timestamp]("min_ts") == ts(3))
    // the fully-cancelled key publishes cnt 0 with null extrema
    val k2 = IncrementalAgg.finish(next, Seq("k"), spec)
      .filter($"k" === 2L).head()
    assert(k2.getLong(1) == 0L && k2.isNullAt(3) && k2.isNullAt(4))
    // state schema matches the from-scratch state (merge-compatible)
    assert(next.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      fromScratch.schema.fields.map(f => (f.name, f.dataType)).toSeq)
  }

  test("min/max specs are rejected for changelog maintenance") {
    val e = intercept[IllegalArgumentException] {
      IncrementalAgg.applyChangelog(
        IncrementalAgg.state(rows, Seq("k"), spec),
        rows.withColumn("_change", lit("upsert")), Seq("k"), spec)
    }
    assert(e.getMessage.contains("not retractable"))
  }

  test("state schema is stable across merge generations") {
    // stability contract = names + types (what unionByName needs);
    // nullability differs between count-built and sum-merged cnt
    def shape(df: DataFrame) = df.schema.fields.map(f => (f.name, f.dataType)).toSeq
    val s0 = IncrementalAgg.state(rows, Seq("k"), spec)
    val g1 = IncrementalAgg.merge(Seq(s0, s0), Seq("k"), spec)
    val g2 = IncrementalAgg.merge(Seq(g1, s0), Seq("k"), spec)
    assert(shape(g1) == shape(s0))
    assert(shape(g2) == shape(s0))
  }
}
