package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class EventsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, hour: Int = 0, min: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:$min%02d:00")

  test("dailyAnomaly: warmup, normal, high and low classification") {
    // type 'a': 10/day for days 1..5, then 30 on day 6 (high) and 2 on
    // day 7 (low — baseline now includes the spike)
    val rows = (1 to 5).flatMap(d => (1 to 10).map(i => ("a", ts(d, i)))) ++
      (1 to 30).map(i => ("a", ts(6, i % 24, i))) ++
      (1 to 2).map(i => ("a", ts(7, i))) ++
      (1 to 4).map(d => (1 to 10).map(i => ("b", ts(d, i)))).flatten
    val df = rows.toDF("event_type", "ts")
    val out = Events.dailyAnomaly(df, trailingDays = 7, minDays = 3, factor = 2.0)
      .orderBy("event_type", "day")
      .select("event_type", "n", "trailing_days", "status")
      .as[(String, Long, Long, String)].collect().toSeq
    val a = out.filter(_._1 == "a")
    assert(a.map(_._4) == Seq("warmup", "warmup", "warmup", "normal",
      "normal", "high", "low"))
    // day 6: baseline = 10, n = 30 > 20 → high; day 7: baseline includes
    // the 30-spike → (10*5+30)/6 = 13.33, n=2 → 4 < 13.33 → low
    assert(a(5)._2 == 30L && a(6)._2 == 2L)
    assert(out.filter(_._1 == "b").map(_._4) == Seq("warmup", "warmup",
      "warmup", "normal"))
  }

  test("dailyAnomaly: baseline is exact mean of observed trailing days") {
    val rows = Seq(("x", ts(1)), ("x", ts(1)), ("x", ts(2)),
      ("x", ts(5)), ("x", ts(5)), ("x", ts(5)), ("x", ts(6)))
    val out = Events.dailyAnomaly(rows.toDF("event_type", "ts"),
        trailingDays = 7, minDays = 3)
      .orderBy("day").select("n", "trailing_days", "baseline")
      .collect()
    // day 6 trails days {1,2,5} (observed only): (2+1+3)/3 = 2.0
    assert(out.last.getLong(1) == 3L && out.last.getDouble(2) == 2.0)
    assert(out.head.isNullAt(2)) // warmup → null baseline
  }

  test("cohortRetention: buckets from first-event day, exact rates") {
    val rows = Seq(
      // cohort 2024-01-01: u1 active days 1,2,9 (buckets 0,0,1); u2 day 1 only
      (1L, ts(1)), (1L, ts(2, 5)), (1L, ts(9)),
      (2L, ts(1, 3)),
      // cohort 2024-01-03: u3 active days 3 and 17 (buckets 0, 2)
      (3L, ts(3)), (3L, ts(17)),
      // u4: first event far out — bucket 0 only
      (4L, ts(20)))
    val out = Events.cohortRetention(rows.toDF("user_id", "ts"), "user_id", "ts",
        bucketDays = 7, maxBuckets = 5)
      .orderBy("cohort_day", "bucket")
      .select("cohort_day", "bucket", "n_active", "cohort_size", "retention")
      .collect().map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(out == Seq(
      ("2024-01-01", 0, 2L, 2L, 1.0),
      ("2024-01-01", 1, 1L, 2L, 0.5),
      ("2024-01-03", 0, 1L, 1L, 1.0),
      ("2024-01-03", 2, 1L, 1L, 1.0),
      ("2024-01-20", 0, 1L, 1L, 1.0)))
  }

  test("cohortRetention: multiple same-day events count a user once") {
    val rows = Seq((1L, ts(1, 1)), (1L, ts(1, 2)), (1L, ts(1, 3)),
      (1L, ts(8, 1)), (1L, ts(8, 2)))
    val out = Events.cohortRetention(rows.toDF("user_id", "ts"),
        "user_id", "ts", bucketDays = 7, maxBuckets = 5)
      .orderBy("bucket").select("bucket", "n_active")
      .as[(Int, Long)].collect().toSeq
    assert(out == Seq((0, 1L), (1, 1L)))
  }

  test("funnel: strict ordering within the deadline, per-step conversion") {
    val rows = Seq(
      // u1 completes all three in order within 72h
      (1L, ts(1, 0), "view"), (1L, ts(1, 5), "click"), (1L, ts(2, 0), "purchase"),
      // u2 clicks BEFORE viewing (out of order) and never again
      (2L, ts(1, 0), "click"), (2L, ts(1, 5), "view"),
      // u3 views then clicks, purchase lands after the 72h deadline
      (3L, ts(1, 0), "view"), (3L, ts(1, 1), "click"), (3L, ts(10, 0), "purchase"),
      // u4 views only
      (4L, ts(1, 0), "view"),
      // u5 purchases without viewing — not in the funnel at all
      (5L, ts(1, 0), "purchase"))
    val out = Events.funnel(rows.toDF("user_id", "ts", "event_type"),
        "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), withinHours = 72)
      .as[(Int, String, Long, Double)].collect().toSeq
    assert(out == Seq(
      (1, "view", 4L, 1.0),          // u1 u2 u3 u4
      (2, "click", 2L, 0.5),         // u1, u3 (u2 clicked before viewing)
      (3, "purchase", 1L, 0.25)))    // u1 only
  }

  test("funnel: same-timestamp step events do not count (strictly after)") {
    val rows = Seq(
      (1L, ts(1, 0), "view"), (1L, ts(1, 0), "click"),
      (2L, ts(1, 0), "view"), (2L, ts(1, 1), "click"))
    val out = Events.funnel(rows.toDF("user_id", "ts", "event_type"),
        "user_id", "ts", "event_type", Seq("view", "click"), 72)
      .as[(Int, String, Long, Double)].collect().toSeq
    assert(out == Seq((1, "view", 2L, 1.0), (2, "click", 1L, 0.5)))
  }

  test("rollingActivity: RANGE frame respects calendar gaps") {
    val rows = Seq(
      (1L, ts(1, 1)), (1L, ts(1, 2)),          // day 1: 2 events
      (1L, ts(3)),                              // day 3
      (1L, ts(10)),                             // day 10 — outside day 3's 7-day window
      (2L, ts(2)))
    val out = Events.rollingActivity(rows.toDF("user_id", "ts"),
        "user_id", "ts", windowDays = 7)
      .orderBy("user_id", "day")
      .collect().map(r => (r.getLong(0), r.getDate(1).toString,
        r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(out == Seq(
      (1L, "2024-01-01", 2L, 2L, 1L),
      (1L, "2024-01-03", 1L, 3L, 2L),   // trailing window spans days 1 and 3
      (1L, "2024-01-10", 1L, 1L, 1L),   // day 3 is 7 days back — out of range
      (2L, "2024-01-02", 1L, 1L, 1L)))
  }

  test("activeUsers: sweep WAU matches the trailing-window definition") {
    val rows = Seq(
      (1L, ts(1)), (1L, ts(1, 5)), (1L, ts(3)), // u1 active days 1, 3
      (2L, ts(2)),                              // u2 active day 2
      (3L, ts(15)))                             // u3 far out — coverage gap
    val out = Events.activeUsers(rows.toDF("user_id", "ts"),
        "user_id", "ts", windowDays = 7)
      .orderBy("day")
      .collect().map(r => (r.getDate(0).toString.takeRight(2).toInt,
        r.getLong(1), r.getLong(2))).toSeq
    assert(out.size == 15) // full spine, days 1..15, zero-activity days kept
    val byDay = out.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byDay(1) == ((1L, 1L)))
    assert(byDay(2) == ((1L, 2L)))   // u1 (day 1) still in window + u2
    assert(byDay(3) == ((1L, 2L)))
    assert(byDay(8) == ((0L, 2L)))   // u1 day-3 and u2 day-2 activity linger
    assert(byDay(9) == ((0L, 1L)))   // u2's day 2 is now 7 days back
    assert(byDay(10) == ((0L, 0L)))  // nobody active in [4, 10]
    assert(byDay(14) == ((0L, 0L)))
    assert(byDay(15) == ((1L, 1L)))
  }

  test("transitions: lead pairs per user, share of from_type outgoing") {
    val rows = Seq(
      // u1: view -> click -> view -> purchase
      (1L, ts(1, 1), 10L, "view"), (1L, ts(1, 2), 11L, "click"),
      (1L, ts(1, 3), 12L, "view"), (1L, ts(1, 4), 13L, "purchase"),
      // u2: view -> view; same-ts pair ordered by event_id tiebreak
      (2L, ts(1, 1), 20L, "view"), (2L, ts(1, 1), 21L, "view"),
      // u3: single event — no transition
      (3L, ts(1, 1), 30L, "click"))
    val out = Events.transitions(rows.toDF("user_id", "ts", "event_id", "event_type"),
        "user_id", "ts", "event_type", tieCols = Seq("event_id"))
      .orderBy("from_type", "to_type")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(out == Seq(
      ("click", "view", 1L, 1.0),           // u1's click -> view
      ("view", "click", 1L, 1.0 / 3.0),     // 3 outgoing view transitions
      ("view", "purchase", 1L, 1.0 / 3.0),
      ("view", "view", 1L, 1.0 / 3.0)))
  }

  test("activeUsers: sweep ≡ brute-force distinct count per day") {
    // pseudo-random-ish activity across 3 weeks, then compare against a
    // literal "count distinct users in [d-6, d]" evaluation
    val rows = for (u <- 1L to 9L; d <- 1 to 21
                    if (u * 31 + d * 17) % 5 == 0) yield (u, ts(d))
    val df = rows.toDF("user_id", "ts")
    val out = Events.activeUsers(df, "user_id", "ts", windowDays = 7)
      .orderBy("day")
      .collect().map(r => (r.getDate(0), r.getLong(1), r.getLong(2))).toSeq
    val act = rows.map { case (u, t) => (u, t.toLocalDateTime.toLocalDate) }.distinct
    for ((day, dau, wau) <- out) {
      val d = day.toLocalDate
      assert(dau == act.count(_._2 == d).toLong)
      val expect = act.filter { case (_, a) =>
        !a.isAfter(d) && !a.isBefore(d.minusDays(6)) }.map(_._1).distinct.size
      assert(wau == expect.toLong, s"day $d")
    }
  }
  test("null timestamps fail loudly in decayedCounts and userSequences") {
    val withNull = Seq(("a", Some(ts(21))), ("a", None))
      .toDF("k", "ts")
      .select($"k", $"ts".cast("timestamp").as("ts"))
    val e1 = intercept[Exception] {
      Events.decayedCounts(withNull, Seq("k"), "ts", halfLifeDays = 7)
        .collect()
    }
    assert(e1.getMessage.contains("null ts"), e1.getMessage)

    val seqIn = Seq((1L, Some(ts(1)), 1L, "view"), (1L, None, 2L, "click"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val e2 = intercept[Exception] {
      Events.userSequences(seqIn, "user_id", "ts", "event_id", "event_type")
        .collect()
    }
    assert(e2.getMessage.contains("silently dropped"), e2.getMessage)
  }

  test("decayedCounts: exact power-of-two weights, newest day full weight") {
    // asOf resolves to day 21 (the max); ages 0, 7, 14 days
    val df = Seq(
      ("a", ts(21)), ("a", ts(21)), ("a", ts(14)), ("a", ts(7)),
      ("b", ts(21))).toDF("k", "ts")
    val out = Events.decayedCounts(df, Seq("k"), "ts", halfLifeDays = 7)
      .orderBy("k").collect()
    // a: 2*2^30 + 2^29 + 2^28 ; b: 2^30
    assert(out(0).getLong(1) == 4L)
    assert(out(0).getLong(2) == 2L * (1L << 30) + (1L << 29) + (1L << 28))
    assert(out(0).getDouble(3) == 2.0 + 0.5 + 0.25)
    assert(out(1).getLong(2) == (1L << 30))
    assert(out(1).getDouble(3) == 1.0)
  }

  test("decayedCounts: ages clamp at maxHalvings, future events at 0") {
    val df = Seq(("k", ts(1)), ("k", ts(21))).toDF("k", "ts")
    val out = Events.decayedCounts(df, Seq("k"), "ts",
      halfLifeDays = 1, maxHalvings = 10).collect()
    // day 1 is 20 halvings ago but clamps to 10; day 21 is age 0
    assert(out(0).getLong(2) == (1L << 10) + 1L)
  }
  test("stationaryDistribution converges to the chain's fixed point") {
    // two-state chain: A->B 1.0; B->A 0.5, B->B 0.5 -> stationary (1/3, 2/3)
    val edges = Seq(
      ("A", "B", 1.0), ("B", "A", 0.5), ("B", "B", 0.5))
      .toDF("f", "t", "p")
    val out = Events.stationaryDistribution(edges, "f", "t", "p",
      iterations = 40).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(out("A") - 1.0 / 3.0) < 1e-6)
    assert(math.abs(out("B") - 2.0 / 3.0) < 1e-6)
    // mass conserved (row-stochastic chain, no dangling states)
    assert(math.abs(out.values.sum - 1.0) < 1e-9)
  }

  test("stationaryDistribution: dangling states lose mass, one step drops sources") {
    // A->B only; B dangles -> after 1 iteration all mass sits on B
    val edges = Seq(("A", "B", 1.0)).toDF("f", "t", "p")
    val out = Events.stationaryDistribution(edges, "f", "t", "p",
      iterations = 1).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out == Map("B" -> 0.5)) // A's half of the uniform start moved
  }
}
