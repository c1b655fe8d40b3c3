package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnnRecallSpec extends SparkSpec {
  import spark.implicits._

  // truth: q1 -> {10, 11, 12}; q2 -> {20, 21}
  private def truth = Seq(
    (1L, 10L), (1L, 11L), (1L, 12L),
    (2L, 20L), (2L, 21L)).toDF("query_id", "neighbor_id")

  test("per-query recall counts overlap exactly; extra approx rows are free") {
    // q1: hits 10 and 12, misses 11, plus a spurious 99 (must not count);
    // q2: full recall
    val approx = Seq(
      (1L, 10L), (1L, 12L), (1L, 99L),
      (2L, 20L), (2L, 21L)).toDF("query_id", "neighbor_id")
    val out = Ann.recallPerQuery(truth, approx).orderBy("query_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out === Array((1L, 3L, 2L, 2.0 / 3.0), (2L, 2L, 2L, 1.0)))
  }

  test("a query the approximate tier returned nothing for keeps n_hit = 0") {
    val approx = Seq((1L, 11L)).toDF("query_id", "neighbor_id")
    val out = Ann.recallPerQuery(truth, approx).orderBy("query_id")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(out === Array((1L, 1L, 1.0 / 3.0), (2L, 0L, 0.0)))
  }

  test("summary micro-averages: sum hits / sum truth, not mean of ratios") {
    val approx = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L)).toDF("query_id", "neighbor_id")
    val r = Ann.recallSummary(truth, approx).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((2L, 5L, 3L)))
    // micro = 3/5; macro would be (1.0 + 0.0)/2 = 0.5 — pin the choice
    assert(r.getDouble(3) === 3.0 / 5.0)
  }

  test("duplicate approx rows do not inflate hits (semi-join semantics)") {
    val approx = Seq(
      (1L, 10L), (1L, 10L), (1L, 10L)).toDF("query_id", "neighbor_id")
    val out = Ann.recallPerQuery(truth, approx)
      .filter(col("query_id") === 1L).collect().head
    assert(out.getLong(2) === 1L)
  }

  test("end-to-end on embeddings: brute force audited against itself is 1") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("embedding"))
    val t = Ann.bruteForceTopK(q, c, k = 4)
    val self = Ann.recallSummary(t, t).collect().head
    assert(self.getDouble(3) === 1.0)
    // and the LSH tier's recall is a valid fraction over the same truth
    val lsh = Ann.recallSummary(t, Ann.lshTopK(q, c, k = 4, bits = 10))
      .collect().head
    assert(lsh.getDouble(3) >= 0.0 && lsh.getDouble(3) <= 1.0)
    assert(lsh.getLong(1) === t.count())
  }
}
