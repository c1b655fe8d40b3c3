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

  // crafted transcripts: one shard (nShards = 1), block size 10.
  // conv 1: 8 chars, mask [2,5); conv 2: 12 chars, masks [0,3) and [9,12).
  // stream: conv1 at [0,8), separator at 8, conv2 at [9,21).
  private val packed = Seq(
    (1L, 8, "2:5"), (2L, 12, "0:3|9:12")).toDF("conv_id", "n_chars", "mask_spans")

  test("pack: block membership, clipping, and mask re-offsets") {
    val out = Sft.pack(packed, blockChars = 10, nShards = 1)
      .orderBy("block_id", "conv_id").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getString(5)))
    assert(out === Array(
      // block 0: conv1 fully inside at [0,8), mask [2,5) unchanged;
      //          conv2's first char lands at 9 -> [9,10), mask [0,3)
      //          clips to the single char 9 -> block-local 9:10
      (0L, 1L, 0L, 8L, "2:5"),
      (0L, 2L, 9L, 1L, "9:10"),
      // block 1 covers stream [10,20): mask [0,3) global [9,12) clips to
      //          [10,12) -> 0:2; mask [9,12) global [18,21) clips to
      //          [18,20) -> 8:10
      (1L, 2L, 0L, 10L, "0:2|8:10"),
      // block 2 covers [20,30): conv2's last char, mask tail [20,21) -> 0:1
      (2L, 2L, 0L, 1L, "0:1")))
  }

  test("pack: empty conversations and empty masks pack cleanly") {
    val t = Seq((1L, 0, ""), (2L, 4, "")).toDF("conv_id", "n_chars", "mask_spans")
    val out = Sft.pack(t, blockChars = 10, nShards = 1).collect()
    assert(out.length === 1)  // conv 1 (0 chars) vanished
    assert(out.head.getString(5) === "")
  }

  test("pack: mask chars are conserved across blocks") {
    val spanChars = (s: String) => s.split("\\|").filter(_.nonEmpty)
      .map { sp => val Array(a, b) = sp.split(":").map(_.toLong); b - a }.sum
    val t = Sft.transcripts(Sft.turns(events, "user_id", "ts", "event_type", "props"))
    val before = t.collect().map(r => spanChars(r.getAs[String]("mask_spans"))).sum
    val after = Sft.pack(t, blockChars = 7, nShards = 2).collect()
      .map(r => spanChars(r.getString(5))).sum
    assert(before > 0 && after === before)
  }

  test("maskAudit: verdicts per failure mode, legal touching spans, null fraction") {
    val t = Seq(
      (1L, 10, "0:4|4:8"),  // touching: legal, frac 0.8
      (2L, 10, "3:20"),     // out of bounds
      (3L, 20, "2:5|4:8"),  // overlap
      (4L, 10, "5:3"),      // inverted
      (5L, 0, ""),          // empty conversation
      (6L, 10, null: String)) // null spans == no masks
      .toDF("conv_id", "n_chars", "mask_spans")
    val out = Sft.maskAudit(t).orderBy("conv_id").collect()
    def row(i: Int) = out(i)
    assert(row(0).getAs[Boolean]("ok") && row(0).getAs[Long]("masked_units") == 8L
      && row(0).getAs[Double]("masked_frac") == 0.8)
    assert(!row(1).getAs[Boolean]("in_bounds") && !row(1).getAs[Boolean]("ok"))
    assert(row(2).getAs[Boolean]("in_bounds") && !row(2).getAs[Boolean]("ordered"))
    assert(!row(3).getAs[Boolean]("in_bounds"))
    assert(row(4).getAs[Boolean]("ok") && row(4).isNullAt(
      out.head.fieldIndex("masked_frac")))
    assert(row(5).getAs[Boolean]("ok") && row(5).getAs[Long]("n_spans") == 0L)
  }

  private val merges = Array(("c", "l"), ("cl", "i"), ("cli", "c"),
    ("clic", "k"), ("e", "r"))

  test("transcriptsTokens: separator-free token offsets matching a manual encode") {
    def ntok(line: String): Long = line.trim.toLowerCase.split("\\s+")
      .filter(_.nonEmpty).map(w => Bpe.encodeWord(w, merges).length.toLong).sum
    val t = Sft.turns(events, "user_id", "ts", "event_type", "props")
    val lines = t.filter(col("conv_id") === 1L).orderBy("turn_idx")
      .select(concat(col("role"), lit(": "), col("content"))).as[String]
      .collect()
    val counts = lines.map(ntok)
    val r = Sft.transcriptsTokens(t, merges)
      .filter(col("conv_id") === 1L).head()
    assert(r.getAs[Long]("n_tokens") == counts.sum)
    // token spans: [sum of prior counts, + own count) for assistant turns
    // (turns 2 and 4, 1-based) — NO joint term between turns
    val expected = Seq(
      (counts.take(1).sum, counts.take(2).sum),
      (counts.take(3).sum, counts.take(4).sum))
      .map { case (a, b) => s"$a:$b" }.mkString("|")
    assert(r.getAs[String]("mask_spans") == expected)
    assert(r.getAs[Long]("n_masked_tokens") == counts(1) + counts(3))
  }

  test("truncateLatestTokens keeps the latest whole turns within the token budget") {
    def ntok(line: String): Long = line.trim.toLowerCase.split("\\s+")
      .filter(_.nonEmpty).map(w => Bpe.encodeWord(w, merges).length.toLong).sum
    val t = Sft.turns(events, "user_id", "ts", "event_type", "props")
    val full = t.filter(col("conv_id") === 1L).orderBy("turn_idx").collect()
    val lineToks = full.map(r =>
      ntok(r.getAs[String]("role") + ": " + r.getAs[String]("content")))
    // budget = exactly the last two turns' tokens (separator-free)
    val budget = lineToks.takeRight(2).sum.toInt
    val kept = Sft.truncateLatestTokens(t, budget, merges)
      .filter(col("conv_id") === 1L).orderBy("turn_idx").collect()
    assert(kept.length == 2)
    assert(kept.map(_.getAs[String]("content")).toSeq ==
      full.takeRight(2).map(_.getAs[String]("content")).toSeq)
    // output is a valid turns table: renumbered, char offsets re-based
    assert(kept.map(_.getAs[Int]("turn_idx")).toSeq == Seq(1, 2))
    assert(kept(0).getAs[Long]("start_off") == 0L)
    assert(kept(1).getAs[Long]("start_off") ==
      kept(0).getAs[Long]("end_off") + 1)
    // one token less than the last turn alone -> conversation vanishes
    val none = Sft.truncateLatestTokens(t, lineToks.last.toInt - 1, merges)
      .filter(col("conv_id") === 1L).count()
    assert(none == 0L)
  }

  test("packTokens: token conservation, block bounds, and mask clipping") {
    val t = Sft.turns(events, "user_id", "ts", "event_type", "props")
    val totals = Sft.transcriptsTokens(t, merges)
      .select(col("conv_id"), col("n_tokens")).as[(Long, Long)]
      .collect().toMap
    val blocks = Sft.packTokens(t, merges, blockTokens = 5, nShards = 2)
      .collect()
    // every conversation's tokens are fully covered, once
    val covered = blocks.groupBy(_.getAs[Long]("conv_id"))
      .map { case (c, rs) => (c, rs.map(_.getAs[Long]("toks_in_block")).sum) }
    assert(covered == totals.filter(_._2 > 0))
    blocks.foreach { r =>
      val n = r.getAs[Long]("toks_in_block")
      assert(n > 0 && n <= 5)
      val s = r.getAs[Long]("start_in_block")
      assert(s >= 0 && s < 5)
      r.getAs[String]("mask_spans_block").split("\\|").filter(_.nonEmpty)
        .foreach { sp =>
          val Array(a, b) = sp.split(":").map(_.toLong)
          assert(a >= 0 && a < b && b <= 5)
        }
    }
  }
}
