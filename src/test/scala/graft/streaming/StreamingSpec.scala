package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming transforms driven through MemoryStream micro-batches. */
class StreamingSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("quality batteries run unmodified on a stream: narrow, no state") {
    // Gopher.profile / C4.profile are stateless narrow projections, so
    // the SAME operators gate a crawl stream with no streaming-specific
    // code — the property that makes the ingest-time filter free.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val good = Seq.fill(10)("the quick brown fox jumps over lazy dogs to be")
      .mkString(" ")
    val gated = graft.llm.Gopher.profile(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text")
      .where(col("keep")).select("doc_id")
    val q = gated.writeStream.format("memory").queryName("gopher_stream")
      .outputMode("append").start()
    try {
      input.addData((1L, good), (2L, "too short to keep"))
      q.processAllAvailable()
      input.addData((3L, good + " ############"))
      q.processAllAvailable()
    } finally q.stop()
    val kept = spark.table("gopher_stream").as[Long].collect().toSet
    assert(kept == Set(1L), s"stream gate kept $kept")

    val input2 = MemoryStream[(Long, String)]
    val cleaned = graft.llm.C4.profile(
        input2.toDF().toDF("doc_id", "text"), "doc_id", "text")
      .where(col("keep")).select("doc_id", "text_clean")
    val q2 = cleaned.writeStream.format("memory").queryName("c4_stream")
      .outputMode("append").start()
    try {
      input2.addData(
        (1L, "One good. Two good. Three good.\nno punctuation line"),
        (2L, "Only one sentence."))
      q2.processAllAvailable()
    } finally q2.stop()
    val rows = spark.table("c4_stream").as[(Long, String)].collect().toMap
    assert(rows.keySet == Set(1L))
    assert(rows(1L) == "One good. Two good. Three good.")
  }

  test("driftEachBatch: running counts fold in, drift converges to batch truth") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    val refDocs = Seq("x y z x", "y y").toDF("text")
    val reference = graft.llm.CorpusStats.tokenCounts(refDocs, "text")
      .localCheckpoint(true)
    var state = Seq.empty[(String, Long)].toDF("term", "c")
    val drifts = scala.collection.mutable.ArrayBuffer[(Long, Double)]()
    val q = StreamingJobs.driftEachBatch(stream, "text", reference,
        readCounts = () => state,
        writeCounts = m => state = m.localCheckpoint(true),
        emitDrift = (id, d) => drifts += (id -> d.head().getAs[Double]("tv")))
      .start()
    try {
      input.addData((1L, "x q q"))          // far from the reference
      q.processAllAvailable()
      input.addData((2L, "x y z x y y"), (3L, "x y z x y y"))
      q.processAllAvailable()
    } finally q.stop()
    assert(drifts.map(_._1) == Seq(0L, 1L))
    // batch 2's mass matches the reference shape → drift strictly drops
    assert(drifts(1)._2 < drifts(0)._2)
    // the maintained state equals a from-scratch count of all batches
    val all = Seq("x q q", "x y z x y y", "x y z x y y").toDF("text")
    val truth = graft.llm.CorpusStats.tokenCounts(all, "text")
      .orderBy("term").collect().toSeq
    assert(state.orderBy("term").collect().toSeq == truth)
    // and the emitted drift equals the batch-computed drift of the whole
    val direct = graft.llm.CorpusStats
      .distributionDriftFromCounts(state, reference)
      .head().getAs[Double]("tv")
    assert(drifts(1)._2 == direct)
  }

  test("windowed event stats with watermark over a memory stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val events = input.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val query = StreamingJobs.windowedEventStats(events, "10 minutes", "1 hour")
      .writeStream.format("memory").queryName("win_stats")
      .outputMode("update").start()
    try {
      input.addData(
        (1L, ts("2024-01-01 10:05:00"), 1L, "click", 1.0),
        (2L, ts("2024-01-01 10:20:00"), 2L, "click", 2.0),
        (3L, ts("2024-01-01 10:40:00"), 1L, "view", 5.0))
      query.processAllAvailable()
      val out = spark.table("win_stats").collect()
      val click = out.find(_.getAs[String]("event_type") == "click").get
      assert(click.getAs[Long]("event_count") == 2)
      assert(click.getAs[Double]("total_value") == 3.0)
      assert(click.getAs[Timestamp]("window_start") == ts("2024-01-01 10:00:00"))

      // late-but-inside-watermark row still updates the window
      input.addData((4L, ts("2024-01-01 10:50:00"), 3L, "click", 1.0))
      query.processAllAvailable()
      val click2 = spark.table("win_stats").collect()
        .filter(_.getAs[String]("event_type") == "click")
        .map(_.getAs[Long]("event_count")).max
      assert(click2 == 3)
    } finally query.stop()
  }

  test("windowed stats transform is batch/stream agnostic") {
    import spark.implicits._
    val batch = Seq(
      (1L, ts("2024-01-01 10:05:00"), 1L, "click", 1.0),
      (2L, ts("2024-01-01 11:05:00"), 1L, "click", 2.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = StreamingJobs.windowedEventStats(batch).collect()
    assert(out.length == 2) // two 1-hour windows
  }

  test("sessionize: events within the gap share one session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val query = StreamingJobs.sessionize(input.toDS(), gapMinutes = 0)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("update").start()
    try {
      input.addData(
        (7L, ts("2024-01-01 10:00:00"), 1.0),
        (7L, ts("2024-01-01 10:10:00"), 2.0),
        (8L, ts("2024-01-01 10:00:00"), 5.0))
      query.processAllAvailable()
      val s7 = spark.table("sessions").filter(col("user_id") === 7L)
        .orderBy(col("events").desc).head()
      assert(s7.getAs[Long]("events") == 2)
      assert(s7.getAs[Double]("total_value") == 3.0)
      assert(s7.getAs[Timestamp]("session_end") == ts("2024-01-01 10:10:00"))
    } finally query.stop()
  }

  test("batch sessionization: gap splits sessions, aggregates per session") {
    import spark.implicits._
    val events = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00"), 1.0),
      (2L, 7L, ts("2024-01-01 10:20:00"), 2.0),   // 20 min gap → same session
      (3L, 7L, ts("2024-01-01 11:20:00"), 4.0),   // 60 min gap → new session
      (4L, 8L, ts("2024-01-01 10:00:00"), 8.0))
      .toDF("event_id", "user_id", "ts", "value")
    val out = StreamingJobs.sessionizeBatch(events, gapMinutes = 30)
      .orderBy("user_id", "session_id").collect()
    assert(out.length == 3)
    val (s1, s2, s3) = (out(0), out(1), out(2))
    assert(s1.getAs[Long]("user_id") == 7L && s1.getAs[Long]("n_events") == 2 &&
      s1.getAs[Double]("total_value") == 3.0 &&
      s1.getAs[Timestamp]("session_end") == ts("2024-01-01 10:20:00"))
    assert(s2.getAs[Long]("user_id") == 7L && s2.getAs[Long]("n_events") == 1 &&
      s2.getAs[Double]("total_value") == 4.0)
    assert(s3.getAs[Long]("user_id") == 8L && s3.getAs[Long]("n_events") == 1)
    // a gap of exactly 30 min does NOT split (strict > semantics)
    val boundary = Seq(
      (1L, 9L, ts("2024-01-01 10:00:00"), 1.0),
      (2L, 9L, ts("2024-01-01 10:30:00"), 1.0))
      .toDF("event_id", "user_id", "ts", "value")
    assert(StreamingJobs.sessionizeBatch(boundary, 30).count() == 1)
  }

  test("foreachBatch merge applies batch upsert semantics per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    var table = Seq((1L, "a", 10.0)).toDF("id", "name", "v")
    val input = MemoryStream[(Long, String, Double)]
    val stream = input.toDF().toDF("id", "name", "v")
    val query = StreamingJobs.mergeEachBatch(stream, Seq("id"), Seq("name", "v"),
      () => table, merged => { table = merged }).start()
    try {
      input.addData((1L, "a", 99.0), (2L, "b", 5.0)) // update + insert
      query.processAllAvailable()
      val rows = table.orderBy("id").collect()
      assert(rows.length == 2)
      assert(rows(0).getDouble(2) == 99.0)
      assert(rows(1).getString(1) == "b")
    } finally query.stop()
  }

  test("streaming dedup drops redeliveries across micro-batches within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val rows = input.toDF().toDF("event_id", "ts", "value")
    val query = StreamingJobs.dedupStream(rows, Seq("event_id"), "ts", "10 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData((1L, ts("2024-01-01 10:00:00"), 1.0),
        (2L, ts("2024-01-01 10:01:00"), 2.0),
        (1L, ts("2024-01-01 10:00:00"), 1.0))  // same-batch redelivery
      query.processAllAvailable()
      input.addData((2L, ts("2024-01-01 10:01:00"), 2.0),  // cross-batch redelivery
        (3L, ts("2024-01-01 10:02:00"), 3.0))
      query.processAllAvailable()
      val out = spark.table("dedup_out").collect()
      assert(out.map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    } finally query.stop()
  }

  test("dedupStream is batch/stream agnostic (batch path keys the same dedup)") {
    import spark.implicits._
    val batch = Seq((1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (2L, ts("2024-01-01 10:01:00"), 2.0))
      .toDF("event_id", "ts", "value")
    val out = StreamingJobs.dedupStream(batch, Seq("event_id"), "ts")
    assert(out.count() == 2)
  }

  test("stream-static enrich joins each micro-batch to a broadcast dim; unmatched keys pass with nulls") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "alice"), (2L, "bob")).toDF("cust_id", "name")
    val input = MemoryStream[(Long, Long, Double)]
    val stream = input.toDF().toDF("event_id", "user_id", "value")
    val enriched = StreamingJobs.enrichStream(stream, dim, "user_id", "cust_id", Seq("name"))
    val query = enriched.writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try {
      input.addData((10L, 1L, 1.0), (11L, 9L, 2.0)) // 9 has no dim row
      query.processAllAvailable()
      input.addData((12L, 2L, 3.0))                 // second micro-batch
      query.processAllAvailable()
      val out = spark.table("enrich_out").orderBy("event_id").collect()
      assert(out.map(r => (r.getLong(0), r.getAs[String]("name"))).toSeq ==
        Seq((10L, "alice"), (11L, null), (12L, "bob")))
    } finally query.stop()
  }

  test("enrichStream is batch/stream agnostic and broadcasts the dim side") {
    import spark.implicits._
    val dim = Seq((1L, "alice")).toDF("cust_id", "name")
    val batch = Seq((10L, 1L), (11L, 9L)).toDF("event_id", "user_id")
    val out = StreamingJobs.enrichStream(batch, dim, "user_id", "cust_id", Seq("name"))
    assert(out.count() == 2)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
  }

  test("stream-stream join: band matches across micro-batches, bounds respected") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val buys = MemoryStream[(Long, Long, Timestamp)]
    val out = StreamingJobs.joinStreams(
      clicks.toDF().toDF("click_id", "cuser", "cts"),
      buys.toDF().toDF("buy_id", "buser", "bts"),
      "cuser", "buser", "cts", "bts",
      before = "0 seconds", after = "30 minutes",
      watermarkDelay = "5 minutes")
    val query = out.writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    try {
      clicks.addData((1L, 7L, ts("2024-01-01 10:00:00")),
        (2L, 7L, ts("2024-01-01 09:00:00")),
        (3L, 8L, ts("2024-01-01 10:00:00")))
      query.processAllAvailable()
      // purchase arrives a BATCH LATER but inside the band of click 1:
      // stream-stream state must still pair them
      buys.addData((100L, 7L, ts("2024-01-01 10:20:00")),
        (101L, 8L, ts("2024-01-01 10:31:00")),  // 31 min after click 3 → out of band
        (102L, 7L, ts("2024-01-01 09:59:00")))  // before click 1 → out of band
      query.processAllAvailable()
      val pairs = spark.table("ss_join")
        .select("click_id", "buy_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == Set((1L, 100L)))
    } finally query.stop()
  }

  test("stream-stream LEFT OUTER: unmatched rows emit nulls after the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val buys = MemoryStream[(Long, Long, Timestamp)]
    val out = StreamingJobs.joinStreams(
      clicks.toDF().toDF("click_id", "cuser", "cts"),
      buys.toDF().toDF("buy_id", "buser", "bts"),
      "cuser", "buser", "cts", "bts",
      before = "0 seconds", after = "10 minutes",
      watermarkDelay = "1 minute", joinType = "left_outer")
    val query = out.writeStream.format("memory").queryName("ss_outer")
      .outputMode("append").start()
    try {
      clicks.addData((1L, 7L, ts("2024-01-01 10:00:00")),  // will match
        (2L, 8L, ts("2024-01-01 10:00:00")))               // never matches
      buys.addData((100L, 7L, ts("2024-01-01 10:05:00")))
      query.processAllAvailable()
      // advance BOTH watermarks far past click 2's band so the engine
      // can prove no matching purchase can still arrive
      clicks.addData((3L, 9L, ts("2024-01-01 12:00:00")))
      buys.addData((101L, 9L, ts("2024-01-01 12:30:00")))
      query.processAllAvailable()
      clicks.addData((4L, 9L, ts("2024-01-01 13:00:00")))
      buys.addData((102L, 9L, ts("2024-01-01 13:30:00")))
      query.processAllAvailable()
      val rows = spark.table("ss_outer")
        .select("click_id", "buy_id").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toSet
      assert(rows.contains((1L, Some(100L))), rows.toString)   // matched pair
      assert(rows.contains((2L, None)), rows.toString)         // watermark-proven miss
    } finally query.stop()
  }

  test("stream-stream join transform doubles as the batch band join") {
    import spark.implicits._
    val l = Seq((1L, 7L, ts("2024-01-01 10:00:00"))).toDF("click_id", "cuser", "cts")
    val r = Seq((100L, 7L, ts("2024-01-01 10:20:00")),
      (101L, 7L, ts("2024-01-01 11:20:00")))
      .toDF("buy_id", "buser", "bts")
    val out = StreamingJobs.joinStreams(l, r, "cuser", "buser", "cts", "bts",
      before = "0 seconds", after = "30 minutes").collect()
    assert(out.length == 1 && out.head.getAs[Long]("buy_id") == 100L)
  }

  test("stream_dedup gate precondition: event_id is unique in the events fixture") {
    // The gate's plain-SELECT oracle is only valid because duplicate
    // deliveries are EXACT copies of unique-keyed events: dropDuplicates
    // picks an arbitrary survivor, so two fixture rows sharing an
    // event_id with different payloads would diverge nondeterministically.
    // Pin the precondition so a future fixture regeneration can't silently
    // invalidate the oracle.
    import org.apache.spark.sql.functions._
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val dupes = spark.read.parquet(s"/root/testdata/$sf/events.parquet")
        .groupBy("event_id").count().filter(col("count") > 1).count()
      assert(dupes == 0L, s"$sf events fixture has $dupes duplicated event_ids")
    }
  }
}
