package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Full-batch gradient-descent linear classifier: it learns a
  * separable problem, the recurrence is deterministic under
  * repartitioning, and the first-iteration weights match hand math.
  */
class LogRegSpec extends SparkSpec {
  import spark.implicits._

  // separable 2-d data: class 1 at x ~ (+1, +1), class 0 at (-1, -1)
  private def separable(n: Int) = {
    val rows = (1 to n).map { i =>
      val y = i % 2
      val base = if (y == 1) 1.0f else -1.0f
      val jitter = ((i * 2654435761L % 1000) / 1000.0f - 0.5f) * 0.2f
      (i.toLong, y.toDouble, Array(base + jitter, base - jitter))
    }
    rows.toDF("id", "y", "vec")
  }

  test("learns a separable problem: accuracy 1.0 after a few iterations") {
    val df = separable(200)
    val model = LogReg.train(df, "y", "vec", iters = 5)
    val scored = LogReg.scores(df, "id", "vec", model)
      .join(df.select(col("id"), col("y")), "id")
    val acc = scored.agg(avg(when(col("pred") === col("y"), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    assert(acc == 1.0)
  }

  test("first iteration matches hand arithmetic (w0 = 0 -> p = 0.5)") {
    // two rows, lr 0.5: g_j = sum dec((0.5 - y) * x_j), w_j = round6(-0.5 g_j / 2)
    val df = Seq((1L, 1.0, Array(2.0f, 0.0f)), (2L, 0.0, Array(0.0f, 4.0f)))
      .toDF("id", "y", "vec")
    val w = LogReg.train(df, "y", "vec", iters = 1)
      .orderBy("j").as[(Int, Double)].collect().map(_._2)
    // bias: r1 + r2 = -0.5 + 0.5 = 0
    assert(w(0) == 0.0)
    // j1: (-0.5)*2 = -1 -> w = -0.5*(-1/2) = 0.25
    assert(w(1) == 0.25)
    // j2: (0.5)*4 = 2 -> w = -0.5*(2/2) = -0.5
    assert(w(2) == -0.5)
  }

  test("training is invariant under repartitioning (decimal sums are order-free)") {
    val df = separable(101)
    val a = LogReg.train(df, "y", "vec", iters = 3)
      .orderBy("j").as[(Int, Double)].collect().toSeq
    val b = LogReg.train(df.repartition(13), "y", "vec", iters = 3)
      .orderBy("j").as[(Int, Double)].collect().toSeq
    assert(a == b)
  }

  test("scores are round-6 and pred flips at the 0.5 boundary") {
    val df = Seq((1L, Array(1.0f, 1.0f)), (2L, Array(-1.0f, -1.0f)),
      (3L, Array(0.0f, 0.0f))).toDF("id", "vec")
    val model = Seq((0, 0.0), (1, 1.0), (2, 1.0)).toDF("j", "w")
    val out = LogReg.scores(df, "id", "vec", model)
      .orderBy("id").collect()
    assert(out(0).getInt(2) == 1 && out(1).getInt(2) == 0)
    // margin 0 -> score exactly 0.5 -> pred 1 (>= boundary)
    assert(out(2).getDouble(1) == 0.5 && out(2).getInt(2) == 1)
    out.foreach { r =>
      val s = r.getDouble(1)
      assert(s == math.floor(s * 1e6 + 0.5) / 1e6)
    }
  }
}
