package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class TemporalSplitSpec extends SparkSpec {
  import spark.implicits._

  private def ts(d: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")

  // out-of-order input on purpose: the split must follow ts, not arrival
  private val events = Seq(
    // user 1: five events -> ceil(0.8*5)=4 train, 1 holdout (the latest)
    (1L, 105L, ts(5)), (1L, 101L, ts(1)), (1L, 103L, ts(3)),
    (1L, 102L, ts(2)), (1L, 104L, ts(4)),
    // user 2: singleton -> all train
    (2L, 201L, ts(1)),
    // user 3: two events -> ceil(1.6)=2, both train
    (3L, 302L, ts(9)), (3L, 301L, ts(2)))
    .toDF("user_id", "event_id", "ts")

  test("per-entity 80/20 temporal split with integer-exact ceil") {
    val out = Sampling.temporalSplit(events, Seq("user_id"), "ts",
        tieCols = Seq("event_id"), trainPct = 80)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[String]("split")))
    val byUser = out.groupBy(_._1)
    assert(byUser(1L).count(_._3 == "train") == 4)
    assert(byUser(1L).filter(_._3 == "holdout").map(_._2).toSeq == Seq(105L))
    assert(byUser(2L).map(_._3).toSeq == Seq("train"))
    assert(byUser(3L).forall(_._3 == "train"))
  }

  test("holdout is strictly later than training data per entity") {
    val out = Sampling.temporalSplit(events, Seq("user_id"), "ts",
        tieCols = Seq("event_id"), trainPct = 80)
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getTimestamp(2).getTime,
        r.getAs[String]("split")))
    for ((_, group) <- rows.groupBy(_._1)) {
      val train = group.filter(_._3 == "train").map(_._2)
      val hold = group.filter(_._3 == "holdout").map(_._2)
      if (hold.nonEmpty) assert(train.max <= hold.min)
    }
  }
}
