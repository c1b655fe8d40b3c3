package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class CsvSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "plain text", "en"),
    (2L, "comma, semicolon; quote \" backslash \\ tab\there", "en"),
    (3L, "embedded\nnewline and unicode: Hà Nội — ✓", "vi"))
    .toDF("doc_id", "text", "lang")

  test("write/read round-trips delimiters, quotes and newlines exactly") {
    val path = Files.createTempDirectory("csv_spec").resolve("d.csv").toString
    Csv.write(docs, path)
    val back = Csv.read(spark, path, docs.schema)
    assert(back.orderBy("doc_id").collect().toSeq ==
      docs.orderBy("doc_id").collect().toSeq)
    // overwrite replaces, not appends
    Csv.write(docs.limit(1), path)
    assert(Csv.read(spark, path, docs.schema).count() == 1L)
  }

  test("tsv delimiter round-trips too") {
    val path = Files.createTempDirectory("csv_spec_t").resolve("d.tsv").toString
    Csv.write(docs, path, delimiter = "\t")
    val back = Csv.read(spark, path, docs.schema, delimiter = "\t")
    assert(back.orderBy("doc_id").collect().toSeq ==
      docs.orderBy("doc_id").collect().toSeq)
  }

  test("quarantine read separates rows that fail the pinned schema") {
    val dir = Files.createTempDirectory("csv_spec_q")
    val f = dir.resolve("feed.csv")
    Files.write(f, Seq(
      "doc_id,text,lang",
      "1,ok,en",
      "2,also ok,en",
      "notanumber,bad type,en").mkString("\n").getBytes("UTF-8"))
    val (good, corrupt) =
      Csv.readWithQuarantine(spark, f.toString, docs.schema,
        multiLine = false)
    assert(good.count() == 2L)
    assert(good.agg(sum("doc_id")).head().getLong(0) == 3L)
    assert(corrupt.as[String].collect().toSeq ==
      Seq("notanumber,bad type,en"))
    good.unpersist()
  }
}
