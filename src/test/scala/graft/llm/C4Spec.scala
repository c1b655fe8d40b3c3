package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class C4Spec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "First sentence here. Second one follows! Third asks?"),  // clean
    (1L, "no terminal punctuation on this line\nBut this one has. And more. Even three."),
    (2L, "Good line one. Good two. Good three.\nPlease enable JavaScript to continue."),
    (3L, "Sentence one. Two here. Three now. We have lorem ipsum embedded."),
    (4L, "One. Two. Three. An inline { brace lurks."),
    (5L, "One. Two. Three. Contains badword sadly."),
    (6L, "Only one sentence."),
    (7L, null.asInstanceOf[String])).toDF("doc_id", "text")

  test("line retention: terminal punctuation and the javascript rule") {
    val p = C4.profile(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc 1: the bare line drops, the punctuated line stays
    assert(p(1L).getAs[Int]("n_lines_kept") == 1)
    assert(p(1L).getAs[Int]("n_lines_dropped") == 1)
    assert(p(1L).getAs[String]("text_clean") ==
      "But this one has. And more. Even three.")
    // doc 2: javascript line dropped even though it ends in '.'
    assert(p(2L).getAs[Boolean]("has_javascript"))
    assert(p(2L).getAs[Int]("n_lines_dropped") == 1)
    assert(!p(2L).getAs[String]("text_clean").toLowerCase.contains("javascript"))
  }

  test("doc-fatal probes and the keep verdict") {
    val p = C4.profile(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(p(0L).getAs[Boolean]("keep") && p(0L).getAs[Int]("n_sentences") == 3)
    assert(p(1L).getAs[Boolean]("keep"), "cleaned doc 1 still has 3 sentences")
    assert(p(3L).getAs[Boolean]("has_lorem") && !p(3L).getAs[Boolean]("keep"))
    assert(p(4L).getAs[Boolean]("has_brace") && !p(4L).getAs[Boolean]("keep"))
    assert(p(5L).getAs[Boolean]("has_bad_word") && !p(5L).getAs[Boolean]("keep"))
    assert(p(6L).getAs[Int]("n_sentences") == 1 && !p(6L).getAs[Boolean]("keep"))
    // null doc: all-zero, all-false, not kept
    assert(p(7L).getAs[Int]("n_lines_kept") == 0 &&
      p(7L).getAs[String]("text_clean") == "" && !p(7L).getAs[Boolean]("keep"))
  }

  test("clean returns survivors with the cleaned text in place") {
    val out = C4.clean(docs, "doc_id", "text")
    val kept = out.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    // doc 2 survives: the javascript rule is LINE-fatal, and its other
    // line alone carries three sentences
    assert(kept.keySet == Set(0L, 1L, 2L))
    assert(kept(1L) == "But this one has. And more. Even three.")
    assert(kept(2L) == "Good line one. Good two. Good three.")
    assert(out.columns.toSet == docs.columns.toSet)
  }

  test("the word probe is a word match, not a substring match") {
    val d = Seq((0L, "The javascripting hobbyist writes. Two. Three."))
      .toDF("doc_id", "text")
    val p = C4.profile(d, "doc_id", "text").head()
    assert(!p.getAs[Boolean]("has_javascript"),
      "'javascripting' must not trip the word rule")
    assert(p.getAs[Boolean]("keep"))
  }
}
