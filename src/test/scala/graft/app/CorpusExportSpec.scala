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
