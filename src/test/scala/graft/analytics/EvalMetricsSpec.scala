package graft.analytics

import graft.SparkSpec

class EvalMetricsSpec extends SparkSpec {
  import spark.implicits._

  // truth/pred pairs: class a (3 true), b (2 true), c (1 true, never
  // predicted; its rows go to a)
  private lazy val preds = Seq(
    ("a", "a"), ("a", "a"), ("a", "b"),
    ("b", "b"), ("b", "b"),
    ("c", "a")).toDF("truth", "pred")

  test("confusionMatrix counts every observed pair") {
    val m = EvalMetrics.confusionMatrix(preds, "truth", "pred")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(m == Map(("a", "a") -> 2L, ("a", "b") -> 1L,
      ("b", "b") -> 2L, ("c", "a") -> 1L))
  }

  test("classReport: hand-computed precision/recall/F1, null guards") {
    val rep = EvalMetrics.classReport(preds, "truth", "pred")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rep.keySet == Set("a", "b", "c"))
    // a: n_true 3, n_pred 3, tp 2
    assert(rep("a").getLong(1) == 3 && rep("a").getLong(2) == 3 &&
      rep("a").getLong(3) == 2)
    assert(rep("a").getDouble(4) == 2.0 / 3.0)     // precision
    assert(rep("a").getDouble(5) == 2.0 / 3.0)     // recall
    assert(rep("a").getDouble(6) == 4.0 / 6.0)     // f1 = 2tp/(nt+np)
    // b: precision 2/3 (one stray a->b), recall 1
    assert(rep("b").getDouble(4) == 2.0 / 3.0 && rep("b").getDouble(5) == 1.0)
    // c: never predicted -> precision null, recall 0, f1 0
    assert(rep("c").isNullAt(4))
    assert(rep("c").getDouble(5) == 0.0 && rep("c").getDouble(6) == 0.0)
  }

  test("aucBinary: perfect, reversed, coin-flip, and tie-averaged cases") {
    def auc(rows: Seq[(Double, Boolean)]): (Long, Long, Option[Double]) = {
      val r = EvalMetrics.aucBinary(rows.toDF("score", "pos"), "score", "pos")
        .head()
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))
    }
    // perfect separation
    assert(auc(Seq((0.9, true), (0.8, true), (0.2, false), (0.1, false)))
      == ((2L, 2L, Some(1.0))))
    // perfectly wrong
    assert(auc(Seq((0.1, true), (0.2, false)))._3.contains(0.0))
    // all scores tied -> 0.5 exactly
    assert(auc(Seq((0.5, true), (0.5, false), (0.5, true), (0.5, false)))
      ._3.contains(0.5))
    // hand-computed tie case: scores (.1+, .1-, .2+) -> ranks 1.5/1.5/3,
    // U = (1.5 + 3) - 2*3/2 = 1.5, AUC = 1.5 / (2*1) = 0.75
    assert(auc(Seq((0.1, true), (0.1, false), (0.2, true)))._3.contains(0.75))
    // degenerate: single class -> null, not 0/0
    assert(auc(Seq((0.3, true), (0.7, true))) == ((2L, 0L, None)))
  }

  test("calibration: bin placement, clamping, and per-bin statistics") {
    val rows = Seq(
      (-1.0, false),           // exact lo -> bin 0
      (-0.95, false),          // bin 0
      (0.0, true), (0.05, false), // bin 5
      (0.99, true), (1.0, true),  // hi clamps into bin 9
      (1.7, true)).toDF("score", "pos") // out-of-range clamps to bin 9
    val out = EvalMetrics.calibration(rows, "score", "pos", bins = 10)
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(out.keySet == Set(0, 5, 9))
    assert(out(0).getLong(1) == 2 && out(0).getLong(2) == 0 &&
      out(0).getDouble(3) == 0.0)
    assert(out(5).getLong(1) == 2 && out(5).getDouble(3) == 0.5)
    assert(out(9).getLong(1) == 3 && out(9).getDouble(3) == 1.0)
    // exact-decimal mean: (0.0 + 0.05) / 2
    assert(out(5).getDouble(4) == 0.025)
  }

  test("aucBinary matches the brute-force pair count on mixed data") {
    val r = new scala.util.Random(11)
    val rows = (0 until 200).map { _ =>
      val pos = r.nextBoolean()
      // positives shifted up, scores quantized to force ties
      val s = math.rint(((if (pos) 0.3 else 0.0) + r.nextDouble()) * 20) / 20
      (s, pos)
    }
    val got = EvalMetrics.aucBinary(rows.toDF("score", "pos"), "score", "pos")
      .head().getDouble(2)
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    assert(got == wins / (pos.size.toDouble * neg.size.toDouble))
  }
}
