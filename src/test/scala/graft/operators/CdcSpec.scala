package graft.operators

import graft.SparkSpec
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
}
