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

  test("hashedTfVector: dense exact counts, zero vector for token-less docs") {
    val docs = Seq((1L, "a b a"), (2L, ""), (3L, null: String))
      .toDF("doc_id", "text")
    val out = TextStats.hashedTfVector(docs, "doc_id", "text", dim = 8)
      .orderBy("doc_id").collect()
    val v1 = out(0).getSeq[Double](1)
    assert(v1.sum === 3.0 && v1.count(_ > 0) === 2) // a:2 + b:1, 2 buckets
    assert(out(1).getSeq[Double](1).forall(_ === 0.0))
    assert(out(2).getSeq[Double](1).forall(_ === 0.0))
  }

  test("text classifier loop learns a length target well above chance") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val y = docs.select(col("doc_id"),
      (col("n_chars") >= 300).cast("int").as("y"))
    val feats = TextStats.hashedTfVector(docs, "doc_id", "text", 32)
      .select(col("doc_id"), transform(col("vec"), x => x / lit(64.0)).as("vec"))
    val model = LogReg.train(feats.join(y, Seq("doc_id")), "y", "vec",
      iters = 10, lr = 2.0)
    val scored = LogReg.scores(feats, "doc_id", "vec", model)
      .join(y, Seq("doc_id"))
    val n = scored.count().toDouble
    val acc = scored.filter(col("pred") === col("y")).count() / n
    val base = math.max(y.filter(col("y") === 1).count() / n,
      y.filter(col("y") === 0).count() / n)
    assert(acc > base + 0.1,
      s"trained accuracy $acc not above majority baseline $base")
  }
}
