package graft.expressions

import graft.SparkSpec
import graft.llm.Chunking
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class ContentChunkSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random text: enough entropy that hash
  // boundaries actually occur
  private def randText(seed: Int, n: Int): String = {
    val r = new scala.util.Random(seed)
    (1 to n).map(_ => ('a' + r.nextInt(26)).toChar).mkString
  }

  private def boundsOf(s: String, minLen: Int = 32, maxLen: Int = 256): Seq[Int] =
    ContentChunkBounds.evalArray(UTF8String.fromString(s), 16, 6, minLen, maxLen)
      .toIntArray().toSeq

  test("boundaries are ascending, clamped, and cover the text exactly") {
    val s = randText(1, 5000)
    val b = boundsOf(s)
    assert(b.last == s.length)
    assert(b == b.sorted && b.distinct == b)
    val sizes = (0 +: b).sliding(2).map(p => p(1) - p(0)).toSeq
    // every chunk within [minLen, maxLen] except possibly the final tail
    assert(sizes.init.forall(l => l >= 32 && l <= 256), sizes.toString)
    assert(sizes.last <= 256)
    assert(boundsOf("") == Seq.empty)
    assert(boundsOf("short") == Seq(5)) // shorter than minLen: one chunk
  }

  test("shift tolerance: a prepended edit leaves the suffix chunks intact") {
    val body = randText(2, 8000)
    val orig = boundsOf(body)
    val edited = "EDITED PREFIX " + randText(3, 300) + body
    val shift = edited.length - body.length
    val ed = boundsOf(edited)
    // chunk hashes = the substrings between boundaries
    def chunks(s: String, b: Seq[Int]) =
      (0 +: b).sliding(2).map(p => s.substring(p(0), p(1))).toSeq
    val origChunks = chunks(body, orig)
    val editChunks = chunks(edited, ed)
    // boundaries resynchronize: a long common suffix of identical chunks
    val common = origChunks.reverse.zip(editChunks.reverse)
      .takeWhile { case (a, b2) => a == b2 }.size
    assert(common >= origChunks.size / 2,
      s"only $common of ${origChunks.size} suffix chunks survived the edit")
    assert(shift > 0)
  }

  test("expression is codegen-callable and SQL-registered; operator slices exactly") {
    val df = Seq((1L, randText(4, 2000)), (2L, "tiny"), (3L, ""))
      .toDF("doc_id", "text")
    val out = Chunking.contentDefined(df, "doc_id", "text")
    val rows = out.orderBy("doc_id", "chunk_idx").collect()
    // empty doc filtered; tiny doc = one chunk
    assert(rows.map(_.getLong(0)).distinct.toSeq == Seq(1L, 2L))
    // reconstruction: per-doc chunk md5s equal locally computed slices
    val text1 = randText(4, 2000)
    val b1 = boundsOf(text1)
    val expect = (0 +: b1).sliding(2).map(p =>
      text1.substring(p(0), p(1))).toSeq
    val got = rows.filter(_.getLong(0) == 1L)
    assert(got.length == expect.length)
    got.zip(expect).foreach { case (r, e) =>
      assert(r.getAs[Int]("n_cp") == e.length)
      assert(r.getAs[String]("chunk_md5") ==
        java.security.MessageDigest.getInstance("MD5").digest(e.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString)
    }
    // SQL surface
    graft.expressions.Functions.register(spark)
    df.createOrReplaceTempView("cdocs")
    val viaSql = spark.sql(
      "SELECT size(content_chunk_bounds(text, 16, 6, 32, 256)) AS nb " +
        "FROM cdocs WHERE doc_id = 1").head().getInt(0)
    assert(viaSql == b1.length)
  }

  test("chunkDuplication: shared blocks surface, unique docs score zero") {
    val shared = randText(7, 1500)
    val docs = Seq(
      (1L, randText(8, 1200) + shared),       // tail shared with doc 2
      (2L, randText(9, 900) + shared),        // different prefix, same tail
      (3L, randText(10, 2000)))               // fully unique
      .toDF("doc_id", "text")
    val out = graft.llm.Dedup.chunkDuplication(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    // the shared tail dominates both docs: well over a third of chunks
    assert(out(1L)._3 > 0.35, out(1L).toString)
    assert(out(2L)._3 > 0.35, out(2L).toString)
    assert(out(3L)._2 == 0L && out(3L)._3 == 0.0)
  }

  test("chunkTrim(contentDefined): cuts shared tail, keeps unique prefix intact") {
    val shared = randText(7, 1500)
    val p1 = randText(8, 1200); val p2 = randText(9, 900)
    val docs = Seq(
      (1L, p1 + shared), (2L, p2 + shared), (3L, randText(10, 2000)))
      .toDF("doc_id", "text")
    val chunks = Chunking.contentDefined(docs, "doc_id", "text")
    val out = graft.llm.Dedup.chunkTrim(docs, chunks, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    // shared tail removed from both docs — content-defined boundaries
    // re-sync despite the different-length prefixes
    assert(out(1L)._2 > 0 && out(2L)._2 > 0)
    assert(out(1L)._3.length < (p1 + shared).length)
    // dropped chunks all lie in the shared tail: the unique prefix
    // survives verbatim (the junction-straddling chunk differs per doc)
    assert(out(1L)._3.startsWith(p1))
    assert(out(2L)._3.startsWith(p2))
    // a doc with no cross-doc chunks round-trips byte-for-byte
    assert(out(3L)._2 == 0L && out(3L)._3 == randText(10, 2000))
  }

  test("chunkTrim: empty and null docs come back as empty with zero counts") {
    val docs = Seq((1L, Option(randText(11, 300))), (2L, Option("")),
      (3L, None: Option[String])).toDF("doc_id", "text")
    val chunks = Chunking.contentDefined(docs, "doc_id", "text")
    val out = graft.llm.Dedup.chunkTrim(docs, chunks, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.length == 3)
    assert(out(1).getLong(1) == 0L && out(1).getString(3) == "")
    assert(out(2).getLong(1) == 0L && out(2).getString(3) == "")
  }

  test("fixedWidth chunker partitions the text and composes with chunkTrim") {
    val a = randText(12, 333)
    val docs = Seq((1L, a), (2L, a), (3L, randText(13, 100)))
      .toDF("doc_id", "text")
    val ch = Chunking.fixedWidth(docs, "doc_id", "text", 64)
    // chunks partition each doc: starts advance by width, lengths sum to len
    val byDoc = ch.groupBy("doc_id")
      .agg(sum("n_cp").as("tot"), count(lit(1)).as("nc")).orderBy("doc_id")
      .collect()
    assert(byDoc(0).getLong(1) == 333L && byDoc(0).getLong(2) == 6L)
    assert(byDoc(2).getLong(1) == 100L && byDoc(2).getLong(2) == 2L)
    val out = graft.llm.Dedup.chunkTrim(docs, ch, "doc_id", "text")
      .orderBy("doc_id").collect()
    // identical docs lose every chunk; the unique doc round-trips
    assert(out(0).getLong(2) == 6L && out(0).getString(3) == "")
    assert(out(1).getLong(2) == 6L)
    assert(out(2).getLong(2) == 0L && out(2).getString(3) == randText(13, 100))
  }

  test("unicode: boundaries count code points, matching substr slicing") {
    val s = "Hà Nội — ✓ " * 40 + randText(5, 500)
    val b = boundsOf(s, minLen = 16, maxLen = 64)
    val df = Seq((1L, s)).toDF("doc_id", "text")
    val rows = Chunking.contentDefined(df, "doc_id", "text",
        minLen = 16, maxLen = 64)
      .orderBy("chunk_idx").collect()
    assert(rows.length == b.length)
    // total code points conserved
    assert(rows.map(_.getAs[Int]("n_cp")).sum == s.codePointCount(0, s.length))
  }
}
