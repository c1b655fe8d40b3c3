package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClassifySpec extends SparkSpec {
  import spark.implicits._

  // three well-separated clusters in 6-dim: class c peaks at dim 2c
  private lazy val labeled = {
    val r = new scala.util.Random(7)
    (0 until 60).map { i =>
      val lab = i % 3
      val v = Array.tabulate(6)(j =>
        (if (j == lab * 2) 1.0f else 0.0f) + r.nextFloat() * 0.05f)
      (i.toLong, v, lab)
    }.toDF("vec_id", "embedding", "label")
  }

  test("dense: train recovers per-class means, predict recovers the labels") {
    val model = Classify.centroidTrain(labeled, "label", "embedding")
    val rows = model.collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getAs[Long]("n_members") == 20L))
    rows.foreach { r =>
      val lab = r.getAs[Int]("label")
      val ce = r.getAs[scala.collection.Seq[Double]]("centroid")
      assert(ce.size == 6)
      assert(ce.zipWithIndex.maxBy(_._1)._2 == lab * 2,
        s"class $lab centroid should peak at dim ${lab * 2}: $ce")
    }
    val pred = Classify.centroidPredict(labeled, "vec_id", "embedding", model)
    assert(pred.count() == 60)
    val wrong = pred.join(labeled.select("vec_id", "label"), "vec_id")
      .filter(col("pred_label") =!= col("label")).count()
    assert(wrong == 0, s"$wrong misclassified")
  }

  test("dense: training is deterministic") {
    val a = Classify.centroidTrain(labeled, "label", "embedding")
      .orderBy("label").collect().map(_.toString).toSeq
    val b = Classify.centroidTrain(labeled, "label", "embedding")
      .orderBy("label").collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("dense: zero-norm rows score -inf and fall to the min label") {
    val model = Classify.centroidTrain(labeled, "label", "embedding")
    val z = Seq((999L, Array.fill(6)(0.0f))).toDF("vec_id", "embedding")
    val r = Classify.centroidPredict(z, "vec_id", "embedding", model).head()
    assert(r.getAs[Int]("pred_label") == 0)
    assert(r.getAs[Double]("cosine").isNegInfinity)
  }

  test("text: disjoint vocabularies classify; every doc gets ONE verdict") {
    val docs = Seq(
      (0L, "apple banana cherry apple", "fruit"),
      (1L, "banana cherry cherry", "fruit"),
      (2L, "carrot potato onion", "veg"),
      (3L, "potato onion onion carrot", "veg"),
      (4L, "apple banana", "fruit"),
      (5L, "carrot potato", "veg")).toDF("doc_id", "text", "lab")
    val model = Classify.textCentroidTrain(docs, "doc_id", "text", "lab",
      dim = 1024)
    val pred = Classify.textCentroidPredict(docs, "doc_id", "text", model,
      dim = 1024)
    assert(pred.count() == 6)
    val got = pred.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred_label")).toMap
    assert(got == Map(0L -> "fruit", 1L -> "fruit", 2L -> "veg",
      3L -> "veg", 4L -> "fruit", 5L -> "veg"))
  }

  test("text: an empty doc scores -inf everywhere and still gets a verdict") {
    val train = Seq(
      (0L, "apple banana cherry", "fruit"),
      (1L, "carrot potato onion", "veg")).toDF("doc_id", "text", "lab")
    val model = Classify.textCentroidTrain(train, "doc_id", "text", "lab",
      dim = 1024)
    val score = Seq((9L, ""), (10L, "apple apple banana"))
      .toDF("doc_id", "text")
    val pred = Classify.textCentroidPredict(score, "doc_id", "text", model,
        dim = 1024)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(pred(9L).getAs[String]("pred_label") == "fruit") // min label tie
    assert(pred(9L).getAs[Double]("cosine").isNegInfinity)
    assert(pred(10L).getAs[String]("pred_label") == "fruit")
    // tf (2,1) vs the all-ones fruit centroid: 3 / (sqrt(5)*sqrt(3))
    assert(math.abs(pred(10L).getAs[Double]("cosine") - 0.774597) < 1e-6)
  }
}
