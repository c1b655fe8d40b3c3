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
}
