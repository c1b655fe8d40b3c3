package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class JsonlSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "plain text", "en"),
    (2L, "quotes \" and \\ slashes\tand tabs", "en"),
    (3L, "unicode: Hà Nội — ✓", "vi"))
    .toDF("doc_id", "text", "lang")

  test("write/read round-trips every byte, strict mode") {
    val path = Files.createTempDirectory("jsonl_spec").resolve("d.jsonl").toString
    Jsonl.write(docs, path)
    val back = Jsonl.read(spark, path, docs.schema)
    assert(back.orderBy("doc_id").collect().toSeq ==
      docs.orderBy("doc_id").collect().toSeq)
    // overwrite is atomic-ish: second write replaces, not appends
    Jsonl.write(docs.limit(1), path)
    assert(Jsonl.read(spark, path, docs.schema).count() == 1L)
  }

  test("quarantine read separates malformed lines and loses nothing") {
    val dir = Files.createTempDirectory("jsonl_spec_q")
    val f = dir.resolve("feed.jsonl")
    val goodLines = Seq(
      """{"doc_id": 1, "text": "ok", "lang": "en"}""",
      """{"doc_id": 2, "text": "also ok", "lang": "en"}""")
    val badLines = Seq("""{"doc_id": 3, "text": unquoted}""", """not json""")
    Files.write(f, String.join("\n",
      (goodLines ++ badLines): _*).getBytes("UTF-8"))
    val (good, corrupt) = Jsonl.readWithQuarantine(spark, f.toString, docs.schema)
    assert(good.count() == 2L)
    assert(good.agg(sum("doc_id")).head().getLong(0) == 3L)
    assert(corrupt.count() == 2L)
    assert(corrupt.as[String].collect().toSet == badLines.toSet)
    good.unpersist()
  }
}
