package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpanCorruptSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "a b c d e f g h i j k l"),   // 12 tokens, 4 blocks of 3
    (1L, "one two"),                   // single partial block
    (2L, "")).toDF("doc_id", "text")   // empty

  test("input/target reassemble the document exactly") {
    // corruptEvery = 2: roughly half the blocks corrupt — enough to
    // exercise sentinel numbering on doc 0
    val out = SpanCorrupt.spanCorrupt(docs, "doc_id", "text",
        spanLen = 3, corruptEvery = 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val r0 = out(0L)
    assert(r0.getAs[Int]("n_tokens") == 12)
    val input = r0.getAs[String]("input_text")
    val target = r0.getAs[String]("target_text")
    val m = r0.getAs[Int]("n_corrupt_spans")
    // target ends with the closing sentinel
    assert(target.endsWith(s"<extra_id_$m>"))
    // splicing each target span back over its sentinel restores the doc
    val spans = ("<extra_id_(\\d+)> ((?:\\w+ ?)+?)(?= <extra_id_|$)".r)
      .findAllMatchIn(target).map(mm => mm.group(1).toInt -> mm.group(2).trim)
      .toMap
    val restored = input.split(" ").flatMap { tok =>
      if (tok.startsWith("<extra_id_"))
        spans(tok.stripPrefix("<extra_id_").stripSuffix(">").toInt).split(" ")
      else Array(tok)
    }.mkString(" ")
    assert(restored == "a b c d e f g h i j k l", restored)
    // sentinels appear in order 0..m-1 in the input
    val ks = "<extra_id_(\\d+)>".r.findAllMatchIn(input)
      .map(_.group(1).toInt).toSeq
    assert(ks == (0 until m), s"sentinel order: $ks")
  }

  test("corruption is a pure function of (id, block): reruns identical") {
    def run() = SpanCorrupt.spanCorrupt(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(run() == run())
  }

  test("edge cases: uncorrupted docs, partial blocks, empty docs") {
    // corruptEvery huge -> nothing corrupts; input is the normalized doc
    val none = SpanCorrupt.spanCorrupt(docs, "doc_id", "text",
        spanLen = 3, corruptEvery = 1000000)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(none(0L).getAs[String]("input_text") == "a b c d e f g h i j k l")
    assert(none(0L).getAs[String]("target_text") == "<extra_id_0>")
    assert(none(0L).getAs[Int]("n_corrupt_spans") == 0)
    assert(none(1L).getAs[String]("input_text") == "one two")
    // empty doc: zero tokens, empty input, bare closing sentinel
    assert(none(2L).getAs[Int]("n_tokens") == 0)
    assert(none(2L).getAs[String]("input_text") == "")
    assert(none(2L).getAs[String]("target_text") == "<extra_id_0>")
  }

  test("the transform plans narrow: no shuffle, no explode") {
    val plan = SpanCorrupt.spanCorrupt(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(400))
    assert(!plan.contains("Generate"), plan.take(400))
  }

  test("fim: PSM pieces splice back to the original; pass-through is verbatim") {
    import spark.implicits._
    val fdocs = (0L to 40L).map(i =>
        (i, s"Doc $i — xin chào 🙂 content ${"x" * (i % 7).toInt}"))
      .toDF("doc_id", "text")
    val out = SpanCorrupt.fim(fdocs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val texts = (0L to 40L).map(i =>
      i -> s"Doc $i — xin chào 🙂 content ${"x" * (i % 7).toInt}").toMap
    var applied = 0
    out.foreach { case (id, r) =>
      val t = texts(id)
      if (r.getAs[Boolean]("fim_applied")) {
        applied += 1
        val s = r.getAs[String]("fim_text")
        // parse the PSM rendering back out
        val pre = s.stripPrefix("<|fim_pre|>")
        val Array(prefix, rest) = pre.split(java.util.regex.Pattern.quote("<|fim_suf|>"), 2)
        val Array(suffix, middle) = rest.split(java.util.regex.Pattern.quote("<|fim_mid|>"), 2)
        assert(prefix + middle + suffix === t, s"doc $id")
        val lo = r.getAs[Int]("fim_lo"); val hi = r.getAs[Int]("fim_hi")
        assert(lo >= 0 && lo <= hi && hi <= t.codePointCount(0, t.length), s"doc $id")
      } else {
        assert(r.getAs[String]("fim_text") === t, s"doc $id")
        assert(r.isNullAt(r.fieldIndex("fim_lo")))
      }
    }
    // the 1-in-2 hash selection actually selects a nontrivial subset
    assert(applied > 5 && applied < 36)
    // deterministic across runs
    val again = SpanCorrupt.fim(fdocs, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq.toString
    val first = SpanCorrupt.fim(fdocs, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq.toString
    assert(again === first)
  }

  test("fim plans narrow and handles the degenerate sizes") {
    import spark.implicits._
    val fdocs = Seq((1L, ""), (2L, "a"), (3L, "ab"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = SpanCorrupt.fim(fdocs, "doc_id", "text", applyEvery = 1)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // n < 2 never applies, null coalesces to empty
    assert(!out(1L).getAs[Boolean]("fim_applied"))
    assert(!out(4L).getAs[Boolean]("fim_applied"))
    assert(out(4L).getAs[String]("fim_text") === "")
    assert(out(3L).getAs[Boolean]("fim_applied"))
    val plan = SpanCorrupt.fim(fdocs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(400))
  }
}
