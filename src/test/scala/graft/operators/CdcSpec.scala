package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.{lit, when}
import java.sql.Timestamp

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def ts(d: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")

  private val log = Seq(
    // key 1: I then U -> final state is the update
    (1L, ts(1), 1L, "I", 10.0),
    (1L, ts(2), 2L, "U", 20.0),
    // key 2: I then D -> absent
    (2L, ts(1), 3L, "I", 30.0),
    (2L, ts(3), 4L, "D", 0.0),
    // key 3: D then RE-INSERT after -> present with the later row
    (3L, ts(2), 5L, "D", 0.0),
    (3L, ts(4), 6L, "I", 44.0),
    // key 4: same-ts tie broken by seq
    (4L, ts(5), 7L, "U", 70.0),
    (4L, ts(5), 8L, "U", 80.0))
    .toDF("key", "ts", "seq", "op", "amount")

  test("applyChanges: last writer wins, deletes erase, ties break on seq") {
    val out = Cdc.applyChanges(log, Seq("key"), "ts", "op",
        tieCols = Seq("seq"))
      .orderBy("key").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq((1L, 2L, 20.0), (3L, 6L, 44.0), (4L, 8L, 80.0)))
  }

  test("applyChanges drops the op column and keeps the payload schema") {
    val out = Cdc.applyChanges(log, Seq("key"), "ts", "op",
      tieCols = Seq("seq"))
    assert(out.columns.toSeq == Seq("key", "ts", "seq", "amount"))
  }

  test("applyChangesStream: changelog over micro-batches, stale rows silent, " +
      "folded state equals batch apply") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val feed = input.toDF().toDF("key", "ts", "seq", "op", "amount")
    val query = Cdc.applyChangesStream(feed, Seq("key"), "ts", "op",
        tieCols = Seq("seq"))
      .writeStream.format("memory").queryName("cdc_stream")
      .outputMode("update").start()
    try {
      input.addData((1L, ts(1), 1L, "I", 10.0), (2L, ts(1), 3L, "I", 30.0))
      query.processAllAvailable()
      assert(spark.table("cdc_stream").count() == 2) // two upserts

      input.addData(
        (1L, ts(2), 2L, "U", 20.0),  // newer update -> upsert
        (2L, ts(3), 4L, "D", 0.0),   // tombstone -> delete
        (3L, ts(4), 6L, "I", 44.0),  // new key -> upsert
        (1L, ts(1), 0L, "U", 99.0))  // STALE (older than key 1's winner)
      query.processAllAvailable()
      val rows = spark.table("cdc_stream").collect()
      assert(rows.length == 5) // the stale row emitted nothing

      // fold the changelog: latest (ts, seq) change per key wins
      val folded = rows.groupBy(_.getLong(0)).map { case (k, rs) =>
        val last = rs.maxBy(r => (r.getTimestamp(1).getTime, r.getLong(2)))
        k -> (last.getAs[String]("_change"), last.getLong(2),
          last.getDouble(3))
      }
      assert(folded(2L)._1 == "delete")
      val live = folded.collect {
        case (k, ("upsert", seq, amt)) => (k, seq, amt)
      }.toSet
      val batchLog = log.union(Seq((1L, ts(1), 0L, "U", 99.0))
        .toDF("key", "ts", "seq", "op", "amount"))
        .filter($"key" <= 3) // keys the stream saw
      val batch = Cdc.applyChanges(batchLog, Seq("key"), "ts", "op",
          tieCols = Seq("seq"))
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(live == batch)
    } finally query.stop()
  }

  test("a null op on the winning row fails loudly, not as a silent delete") {
    val bad = Seq((1L, ts(1), 1L, "I", 10.0))
      .toDF("key", "ts", "seq", "op", "amount")
      .union(Seq((1L, ts(2), 2L, null.asInstanceOf[String], 20.0))
        .toDF("key", "ts", "seq", "op", "amount"))
    val e = intercept[Exception] {
      Cdc.applyChanges(bad, Seq("key"), "ts", "op", tieCols = Seq("seq"))
        .collect()
    }
    assert(e.getMessage.contains("malformed feed"), e.getMessage)
  }

  test("null keys and embedded separators keep distinct stream state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, Long, String, Double)]
    val feed = input.toDF().toDF("key", "ts", "seq", "op", "amount")
      .withColumn("key", when($"key" === "__NULL__",
        lit(null).cast("string")).otherwise($"key"))
    val q = Cdc.applyChangesStream(feed, Seq("key"), "ts", "op",
        tieCols = Seq("seq"))
      .writeStream.format("memory").queryName("cdc_keys")
      .outputMode("update").start()
    try {
      // a NULL key and the literal string "null" must not share state
      input.addData(
        ("__NULL__", ts(1), 1L, "I", 1.0),
        ("null", ts(1), 2L, "I", 2.0))
      q.processAllAvailable()
      assert(spark.table("cdc_keys").count() == 2)
    } finally q.stop()
  }

  test("applyChangesStream retraction mode emits view deltas") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val feed = input.toDF().toDF("key", "ts", "seq", "op", "amount")
    val query = Cdc.applyChangesStream(feed, Seq("key"), "ts", "op",
        tieCols = Seq("seq"), emitRetractions = true)
      .writeStream.format("memory").queryName("cdc_retract")
      .outputMode("update").start()
    try {
      input.addData((1L, ts(1), 1L, "I", 10.0), (2L, ts(1), 2L, "I", 30.0))
      query.processAllAvailable()
      // first sight of each key: upsert only, nothing to retract
      assert(spark.table("cdc_retract").collect()
        .map(_.getAs[String]("_change")).toSeq == Seq("upsert", "upsert"))

      input.addData(
        (1L, ts(2), 3L, "U", 20.0),  // update -> retract 10.0, upsert 20.0
        (2L, ts(3), 4L, "D", 0.0))   // delete -> retract 30.0 only
      query.processAllAvailable()
      val deltas = spark.table("cdc_retract").collect()
        .map(r => (r.getLong(0), r.getDouble(3), r.getAs[String]("_change")))
      assert(deltas.count(_ == ((1L, 10.0, "retract"))) == 1)
      assert(deltas.count(_ == ((1L, 20.0, "upsert"))) == 1)
      assert(deltas.count(_ == ((2L, 30.0, "retract"))) == 1)
      // the tombstone itself is never asserted as a row
      assert(!deltas.contains((2L, 0.0, "upsert")))
      assert(deltas.length == 5)
    } finally query.stop()
  }
}
