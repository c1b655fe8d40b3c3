package graft.streaming

import graft.SparkSpec
import graft.operators.{Cdc, IncrementalAgg}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** End-to-end maintained materialized view: a CDC feed streams through
  * [[Cdc.applyChangesStream]] in retraction mode, each micro-batch's
  * view deltas fold into persistent rollup state via
  * [[IncrementalAgg.applyChangelog]] (foreachBatch), and after every
  * batch the maintained aggregate must equal the from-scratch rollup
  * of the collapsed table — the loop a 100 TB warehouse runs so its
  * summary tables never re-read history.
  */
class MaintainedViewSpec extends SparkSpec {
  import spark.implicits._

  private def ts(d: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")

  test("streamed CDC deltas maintain a rollup equal to from-scratch") {
    implicit val sqlCtx = spark.sqlContext
    val spec = IncrementalAgg.Spec(
      sumCols = Seq("amount"), avgOf = Seq("amount"))
    val keys = Seq("grp")

    // mutable "persisted" state, replaced batch by batch (collect-backed
    // so the test sees a stable snapshot; production writes a table)
    var state: DataFrame = IncrementalAgg.state(
      Seq.empty[(Long, Double)].toDF("grp", "amount"), keys, spec)
      .localCheckpoint(true)

    val input = MemoryStream[(Long, Timestamp, Long, String, Long, Double)]
    val feed = input.toDF().toDF("id", "ts", "seq", "op", "grp", "amount")
    val deltas = Cdc.applyChangesStream(feed, Seq("id"), "ts", "op",
      tieCols = Seq("seq"), emitRetractions = true)
    val query = deltas.writeStream.outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val payload = batch.select(col("grp"), col("amount"), col("_change"))
        state = IncrementalAgg.applyChangelog(state, payload, keys, spec)
          .localCheckpoint(true)
        ()
      }.start()

    def maintained(): Seq[(Long, Long, Double)] =
      IncrementalAgg.finish(state, keys, spec)
        .filter(col("cnt") > 0).orderBy("grp").collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    def fromScratch(log: Seq[(Long, Timestamp, Long, String, Long, Double)]) = {
      val collapsed = Cdc.applyChanges(
        log.toDF("id", "ts", "seq", "op", "grp", "amount"),
        Seq("id"), "ts", "op", tieCols = Seq("seq"))
      IncrementalAgg.finish(
          IncrementalAgg.state(collapsed.select("grp", "amount"), keys, spec),
          keys, spec)
        .filter(col("cnt") > 0).orderBy("grp").collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    }

    try {
      val b1 = Seq(
        (1L, ts(1), 1L, "I", 10L, 5.25),
        (2L, ts(1), 2L, "I", 10L, 4.75),
        (3L, ts(1), 3L, "I", 20L, 9.00))
      input.addData(b1: _*)
      query.processAllAvailable()
      assert(maintained() == fromScratch(b1))

      // batch 2: re-price row 1 (group 10), delete row 3 (group 20
      // drops out), move row 2 to group 20 (retract from 10, assert 20)
      val b2 = Seq(
        (1L, ts(2), 4L, "U", 10L, 6.00),
        (3L, ts(2), 5L, "D", 20L, 0.0),
        (2L, ts(3), 6L, "U", 20L, 4.75))
      input.addData(b2: _*)
      query.processAllAvailable()
      assert(maintained() == fromScratch(b1 ++ b2))
    } finally query.stop()
  }
}
