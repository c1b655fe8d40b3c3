package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** SFT conversation assembly: offsets tile the transcript, the mask
  * covers exactly the assistant turns, truncation keeps the latest
  * whole turns, and the rollup is order-deterministic.
  */
class SftSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private val events = Seq(
    (1L, ts(10), 1L, "click", """{"k":1}"""),
    (1L, ts(20), 2L, "error", """{"k":2}"""),
    (1L, ts(30), 3L, "view", null: String),
    (1L, ts(40), 4L, "purchase", """{"k":4}"""),
    (2L, ts(10), 5L, "signup", """{"k":5}""")
  ).toDF("user_id", "ts", "event_id", "event_type", "props")

  test("turns: roles, order, and [start,end) offsets that tile the transcript") {
    val t = Sft.turns(events, "user_id", "ts", "event_type", "props")
      .filter(col("conv_id") === 1L).orderBy("turn_idx").collect()
    assert(t.map(_.getAs[String]("role")).toSeq ==
      Seq("user", "assistant", "user", "assistant"))
    // null props render as empty string after the space
    assert(t(2).getAs[String]("content") == "view ")
    // offsets: each start = previous end + 1 (the newline)
    assert(t(0).getAs[Long]("start_off") == 0L)
    (1 until t.length).foreach { i =>
      assert(t(i).getAs[Long]("start_off") ==
        t(i - 1).getAs[Long]("end_off") + 1)
    }
    assert(t.map(_.getAs[Boolean]("masked")).toSeq ==
      Seq(false, true, false, true))
  }

  test("transcripts: mask spans select exactly the assistant text") {
    val t = Sft.turns(events, "user_id", "ts", "event_type", "props")
    val r = Sft.transcripts(t).filter(col("conv_id") === 1L).head()
    val transcript = r.getAs[String]("transcript")
    val spans = r.getAs[String]("mask_spans").split('|')
      .map { s => val Array(a, b) = s.split(':'); (a.toInt, b.toInt) }
    val maskedText = spans.map { case (a, b) => transcript.substring(a, b) }
    assert(maskedText.forall(_.startsWith("assistant: ")))
    assert(r.getAs[Long]("n_masked_turns") == 2L)
    assert(r.getAs[Long]("n_masked_chars") == maskedText.map(_.length).sum)
    assert(r.getAs[Int]("n_chars") == transcript.length)
    // line structure: n_turns lines joined by \n
    assert(transcript.split('\n').length == r.getAs[Long]("n_turns"))
  }

  test("truncateLatest keeps the newest whole turns within budget and re-offsets") {
    val t = Sft.turns(events, "user_id", "ts", "event_type", "props")
    val full = t.filter(col("conv_id") === 1L).orderBy("turn_idx").collect()
    val lastTwoLen = full.takeRight(2).map(_.getAs[Int]("line_len") + 1).sum - 1
    val cut = Sft.truncateLatest(t, lastTwoLen)
      .filter(col("conv_id") === 1L).orderBy("turn_idx").collect()
    assert(cut.length == 2)
    // the kept turns are the LAST two, renumbered from 1, offsets from 0
    assert(cut(0).getAs[String]("content") ==
      full(2).getAs[String]("content"))
    assert(cut(0).getAs[Int]("turn_idx") == 1)
    assert(cut(0).getAs[Long]("start_off") == 0L)
    assert(cut(1).getAs[Long]("start_off") ==
      cut(0).getAs[Long]("end_off") + 1)
    // a budget below the smallest line keeps nothing
    assert(Sft.truncateLatest(t, 1).filter(col("conv_id") === 1L).count() == 0)
  }

  test("assembly is invariant under input row order and partitioning") {
    val shuffled = events.orderBy(rand(7)).repartition(5)
    val a = Sft.transcripts(Sft.turns(events, "user_id", "ts", "event_type", "props"))
      .orderBy("conv_id").collect().toSeq
    val b = Sft.transcripts(Sft.turns(shuffled, "user_id", "ts", "event_type", "props"))
      .orderBy("conv_id").collect().toSeq
    assert(a == b)
  }
}
