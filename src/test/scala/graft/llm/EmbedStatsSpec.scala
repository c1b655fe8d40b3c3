package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EmbedStatsSpec extends SparkSpec {
  import spark.implicits._

  test("meanVector and gramExact: hand-computed values on tiny data") {
    val vs = Seq(
      (0L, Array(1.0f, 2.0f)),
      (1L, Array(3.0f, 4.0f))).toDF("vec_id", "embedding")
    val means = EmbedStats.meanVector(vs, "embedding")
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(means == Map(0 -> 2.0, 1 -> 3.0))
    val g = EmbedStats.gramExact(vs, "vec_id", "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(g.keySet == Set((0, 0), (0, 1), (1, 1)))
    // m2(0,0) = (1 + 9)/2 = 5; cov = 5 - 4 = 1
    assert(g((0, 0)) == ((2L, 5.0, 1.0)))
    // m2(0,1) = (2 + 12)/2 = 7; cov = 7 - 6 = 1
    assert(g((0, 1)) == ((2L, 7.0, 1.0)))
    // m2(1,1) = (4 + 16)/2 = 10; cov = 10 - 9 = 1
    assert(g((1, 1)) == ((2L, 10.0, 1.0)))
  }

  test("gramFast agrees with gramExact regardless of partitioning") {
    val r = new scala.util.Random(13)
    val vs = (0 until 120).map(i =>
      (i.toLong, Array.fill(6)(r.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val exact = EmbedStats.gramExact(vs, "vec_id", "embedding")
      .collect().map(r0 => (r0.getInt(0), r0.getInt(1)) -> r0.getDouble(3))
      .toMap
    for (parts <- Seq(1, 7)) {
      val fast = EmbedStats.gramFast(vs.repartition(parts), "embedding", dim = 6)
        .collect().map(r0 => (r0.getInt(0), r0.getInt(1)) -> r0.getDouble(3))
        .toMap
      assert(fast.keySet == exact.keySet)
      fast.foreach { case (jk, v) =>
        assert(math.abs(v - exact(jk)) < 1e-9, s"$jk at $parts parts")
      }
    }
  }

  test("gramFast: empty input yields the zero matrix, n = 0") {
    val vs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val g = EmbedStats.gramFast(vs, "embedding", dim = 3).collect()
    assert(g.length == 6)
    assert(g.forall(r => r.getLong(2) == 0L && r.getDouble(3) == 0.0))
  }

  test("standardize: known z-scores, constant dims pin to 0, decimal render") {
    val vs = Seq(
      (0L, Array(1.0f, 5.0f, 0.0001f)),
      (1L, Array(3.0f, 5.0f, -0.0001f))).toDF("vec_id", "embedding")
    val z = EmbedStats.standardize(vs, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // dim 0: mean 2, sd 1 -> z = -1, +1; dim 1 constant -> 0; dim 2:
    // mean 0, sd 1e-4 -> z = +-1 (and the render must NOT go scientific)
    assert(z(0L) == "0:-1.000000 1:0.000000 2:1.000000", z(0L))
    assert(z(1L) == "0:1.000000 1:0.000000 2:-1.000000", z(1L))
  }

  test("embeddingDrift: zero on identical slices, positive on a shift") {
    val r = new scala.util.Random(17)
    val base = (0 until 60).map(i => (i.toLong, Array.fill(4)(r.nextFloat())))
    val a = base.toDF("vec_id", "embedding")
    val same = EmbedStats.embeddingDrift(a, a, "embedding").head()
    assert(same.getAs[Double]("l2") == 0.0)
    assert(same.getAs[Double]("cosine") == 1.0)
    assert(same.getAs[Long]("n_a") == 60L && same.getAs[Long]("n_b") == 60L)
    val shifted = base.map { case (i, v) => (i, v.map(_ + 0.5f)) }
      .toDF("vec_id", "embedding")
    val moved = EmbedStats.embeddingDrift(a, shifted, "embedding").head()
    assert(moved.getAs[Double]("l2") > 0.9, moved.toString) // ~sqrt(4*0.25)
    assert(moved.getAs[Double]("cosine") < 1.0)
  }
}
