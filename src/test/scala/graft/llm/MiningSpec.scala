package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MiningSpec extends SparkSpec {
  import spark.implicits._

  // A = two orthogonal probes; B = a HUB (fairly close to both probes)
  // and a SPECIFIC match (close only to x1, but less close than the
  // hub). Raw cosine picks the hub for x1; margin picks the specific
  // match — the miscalibration the margin criterion exists to fix.
  //   cos(hub, x1) = .99/1.158 ~ 0.855   cos(hub, x2) = .6/1.158 ~ 0.518
  //   cos(y,   x1) = 0.8               cos(y,   x2) = 0
  private lazy val a = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f))).toDF("query_id", "embedding")
  private lazy val b = Seq(
    (10L, Array(0.99f, 0.6f, 0.0f)),   // hub
    (11L, Array(0.8f, 0.0f, 0.6f))).toDF("match_id", "embedding")

  test("margin out-ranks a hub that wins on raw cosine") {
    val mined = Mining.marginMine(a, b, k = 2, topM = 2)
    val rows = mined.collect()
      .map(r => (r.getLong(0), r.getInt(4)) -> (r.getLong(1), r.getDouble(3)))
      .toMap
    // raw cosine argmax for x1 is the hub...
    val cosTop = Mining.marginMine(a, b, k = 2, topM = 2)
      .filter(col("query_id") === 1L)
      .orderBy(col("cosine").desc).head().getLong(1)
    assert(cosTop == 10L, "scenario broken: hub should win on raw cosine")
    // ...but the margin rank-1 match is the specific neighbor
    assert(rows((1L, 1))._1 == 11L,
      s"margin should prefer the specific match: $rows")
    // hub margin deflated below 1x of its neighborhood-adjusted bar
    assert(rows((1L, 2))._2 < rows((1L, 1))._2)
  }

  test("margin values match the published formula, locally recomputed") {
    def cos6(u: Array[Float], v: Array[Float]): Double = {
      val dot = u.zip(v).foldLeft(0.0) { case (acc, (x, y)) =>
        acc + x.toDouble * y.toDouble }
      def nrm(w: Array[Float]) = math.sqrt(
        w.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))
      BigDecimal(dot / (nrm(u) * nrm(v)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val av = a.collect().map(r => r.getLong(0) ->
      r.getAs[scala.collection.Seq[Float]]("embedding").toArray).toMap
    val bv = b.collect().map(r => r.getLong(0) ->
      r.getAs[scala.collection.Seq[Float]]("embedding").toArray).toMap
    val cos = for ((ai, u) <- av; (bi, v) <- bv) yield (ai, bi) -> cos6(u, v)
    def avg(xs: Iterable[Double]) = xs.sum / xs.size // exact: tiny round-6 set
    val aavg = av.keys.map(ai =>
      ai -> avg(bv.keys.map(bi => cos((ai, bi))).toSeq.sorted.reverse.take(2))).toMap
    val bavg = bv.keys.map(bi =>
      bi -> avg(av.keys.map(ai => cos((ai, bi))).toSeq.sorted.reverse.take(2))).toMap
    val expect = cos.map { case ((ai, bi), c) =>
      (ai, bi) -> BigDecimal(c / ((aavg(ai) + bavg(bi)) / 2.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = Mining.marginMine(a, b, k = 2, topM = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    got.foreach { case (pair, m) =>
      assert(math.abs(m - expect(pair)) < 1e-9, s"$pair: $m vs ${expect(pair)}")
    }
  }

  test("mutualTopK keeps only reciprocally ranked pairs") {
    val scored = Mining.cosineAllPairs(a, b)
    // k = 1: x1's best is the hub (0.855) and the hub's best is x1, so
    // (x1, hub) is mutual; y's best is x1 but x1's best is NOT y -> out;
    // x2's best is the hub but the hub's best is x1 -> out.
    val m1 = Mining.mutualTopK(scored, k = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(m1 == Set((1L, 10L)), m1.toString)
    // k = 2 over a 2x2 relation: everything is mutual, ranks populated
    val m2 = Mining.mutualTopK(scored, k = 2).collect()
    assert(m2.length == 4)
    assert(m2.forall(r => r.getInt(3) <= 2 && r.getInt(4) <= 2))
  }

  test("zero-norm vectors are dropped, not ranked") {
    val bz = b.union(Seq((12L, Array(0.0f, 0.0f, 0.0f)))
      .toDF("match_id", "embedding"))
    val mined = Mining.marginMine(a, bz, k = 2, topM = 3).collect()
    assert(!mined.exists(_.getLong(1) == 12L))
    assert(mined.forall(r => !r.getDouble(2).isNegInfinity))
  }

  test("marginScores re-ranks an ANN-nominated candidate relation") {
    // candidates from the brute cosine tier (top-2 per query) feed the
    // scorer — the at-scale composition; margins agree with the brute
    // mine on the shared pairs
    val e = (0 until 30).map { i =>
      val r = new scala.util.Random(i)
      (i.toLong, Array.tabulate(8)(_ => r.nextFloat()))
    }.toDF("vec_id", "embedding")
    val qs = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val cs = e.filter(col("vec_id") >= 3)
      .select(col("vec_id").as("neighbor_id"), col("embedding"))
    val cand = Ann.bruteForceTopK(qs, cs, k = 8)
      .select(col("query_id"), col("neighbor_id").as("match_id"),
        col("cosine"))
    val reranked = Mining.marginScores(cand, k = 4, topM = 2)
    assert(reranked.count() == 6)
    assert(reranked.filter(col("margin").isNull).count() == 0)
  }
}
