package graft.app

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

class CorpusExportSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (1 to 200)
    .map(i => (i.toLong, s"document body $i", s"src${i % 3}"))
    .toDF("doc_id", "text", "source")
  private val vcols = Seq("doc_id", "text", "source")

  test("export shards deterministically and verify accepts the result") {
    val root = Files.createTempDirectory("corpus_exp").resolve("c").toString
    val manifest = CorpusExport.export(docs, "doc_id", vcols, root, nShards = 4)
    val rows = manifest.collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(0, 1, 2, 3))
    assert(rows.map(_.getLong(1)).sum == 200L)
    // one data file per shard: the repartition-on-shard write contract
    for (k <- 0 to 3) {
      val files = Files.list(Paths.get(s"$root/shard=$k")).iterator().asScala
        .filter(_.toString.endsWith(".json")).toSeq
      assert(files.size == 1, s"shard $k has ${files.size} files")
    }
    val ver = CorpusExport.verify(spark, root, docs.schema, "doc_id",
      vcols, manifest)
    assert(ver.collect().forall(_.getString(1) == "ok"))
    // deterministic: a second export elsewhere yields the same manifest
    val root2 = Files.createTempDirectory("corpus_exp2").resolve("c").toString
    val manifest2 = CorpusExport.export(docs, "doc_id", vcols, root2, 4)
    assert(manifest2.collect().toSeq == rows.toSeq)
  }

  test("prepareTrainingRun: curate -> split -> export -> versioned register") {
    import org.apache.spark.sql.functions._
    val base = (1 to 80).map { i =>
      (i.toLong, s"the quick document number $i talks about topic ${i % 7} " +
        s"and subject ${i % 11} in plain words")
    }
    // plant one exact duplicate pair and one junk row the quality
    // filter should drop
    val docs = (base :+ (81L, base(4)._2) :+ (82L, "x"))
      .toDF("doc_id", "text")
    val root = Files.createTempDirectory("train_run").resolve("r").toString
    val (v1, manifest) = CorpusExport.prepareTrainingRun(
      docs, root, nShards = 2, splits = Seq("train" -> 0.8, "val" -> 0.2))
    assert(v1 == 1L)
    val rows = manifest.collect()
    // junk + duplicate rows are gone: total exported = 80 curated docs
    assert(rows.map(_.getAs[Long]("n_docs")).sum == 80L)
    assert(rows.map(_.getAs[String]("split")).toSet == Set("train", "val"))
    // each split's export passes its own manifest verification
    val schema = docs.schema
    for (split <- Seq("train", "val")) {
      val m = manifest.filter(col("split") === split).drop("split")
      val ver = CorpusExport.verify(spark, s"$root/$split", schema,
        "doc_id", Seq("doc_id", "text"), m)
      assert(ver.collect().forall(_.getString(1) == "ok"), split)
    }
    // the registered run is readable and a re-run registers version 2
    // with the identical manifest (determinism end to end)
    val reg = graft.storage.Versioned.read(spark, s"$root/_runs", v1)
    assert(reg.orderBy("split", "shard").collect().toSeq ==
      manifest.orderBy("split", "shard").collect().toSeq)
    val (v2, manifest2) = CorpusExport.prepareTrainingRun(
      docs, root, nShards = 2, splits = Seq("train" -> 0.8, "val" -> 0.2))
    assert(v2 == 2L)
    assert(manifest2.orderBy("split", "shard").collect().toSeq ==
      manifest.orderBy("split", "shard").collect().toSeq)
  }

  test("prepareTrainingRun: decontamination drops eval-leaked docs only") {
    import org.apache.spark.sql.functions._
    val base = (1 to 60).map { i =>
      (i.toLong, s"the quick document number $i talks about topic ${i % 7} " +
        s"and subject ${i % 11} in plain words")
    }.toDF("doc_id", "text")
    // the eval set contains doc 5's text verbatim — a benchmark leak
    val evalSet = Seq(
      (1000L, base.filter(col("doc_id") === 5L).head().getString(1)),
      (1001L, "completely unrelated held out evaluation prompt text"))
      .toDF("doc_id", "text")
    val root = Files.createTempDirectory("train_decon").resolve("r").toString
    val (_, manifest) = CorpusExport.prepareTrainingRun(
      base, root, nShards = 2, splits = Seq("train" -> 1.0),
      evalSet = Some(evalSet))
    assert(manifest.collect().map(_.getAs[Long]("n_docs")).sum == 59L)
    // the leaked doc is the one missing from the export
    val back = spark.read.schema(base.schema.add("shard", "int"))
      .json(s"$root/train")
    assert(back.count() == 59L)
    assert(back.filter(col("doc_id") === 5L).count() == 0L)
  }

  test("a tampered shard is flagged mismatch, the rest stay ok") {
    val root = Files.createTempDirectory("corpus_tamper").resolve("c").toString
    val manifest = CorpusExport.export(docs, "doc_id", vcols, root, nShards = 4)
      .localCheckpoint(true) // pin: recomputing after tamper would hide it
    val f = Files.list(Paths.get(s"$root/shard=2")).iterator().asScala
      .filter(_.toString.endsWith(".json")).toSeq.head
    Files.writeString(f,
      """{"doc_id": 9999, "text": "injected", "source": "evil"}""" + "\n",
      java.nio.file.StandardOpenOption.APPEND)
    // drop Hadoop's local-FS CRC sidecar: it would reject the append at
    // the filesystem layer, but object stores have no such sidecar —
    // the manifest checksum is the defense being tested here
    Files.deleteIfExists(f.getParent.resolve("." + f.getFileName + ".crc"))
    val ver = CorpusExport.verify(spark, root, docs.schema, "doc_id",
        vcols, manifest)
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(ver(2) == "mismatch")
    assert(Seq(0, 1, 3).forall(k => ver(k) == "ok"))
  }
}
