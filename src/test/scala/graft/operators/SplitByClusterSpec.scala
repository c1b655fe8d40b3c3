package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SplitByClusterSpec extends SparkSpec {
  import spark.implicits._

  private val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  private lazy val docs = (1L to 40L).toDF("doc_id")
  // two multi-member clusters + singletons for the rest
  private lazy val clusters = Seq(
    (1L, 1L), (2L, 1L), (3L, 1L),
    (4L, 4L), (5L, 4L)).toDF("doc_id", "canonical_id")

  test("every member of a cluster lands in the SAME split") {
    val out = Sampling.splitByCluster(docs, "doc_id", clusters,
        "doc_id", "canonical_id", splits)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("split_key"), r.getAs[String]("split"))).toMap
    assert(out.size == 40)
    assert(Set(out(1L), out(2L), out(3L)).size == 1, "cluster 1 split apart")
    assert(out(4L) == out(5L), "cluster 4 split apart")
    assert(out(1L)._1 == 1L && out(4L)._1 == 4L)
  }

  test("docs without a cluster row fall back to the plain hash split") {
    val out = Sampling.splitByCluster(docs, "doc_id", clusters,
        "doc_id", "canonical_id", splits)
      .filter(col("doc_id") > 5)
    val plain = Sampling.hashSplit((6L to 40L).toDF("doc_id"), "doc_id", splits)
    val a = out.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = plain.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    // and the fallback split key is the doc's own id
    assert(out.filter(col("split_key") =!= col("doc_id")).count() == 0)
  }

  test("corpus growth never moves an existing assignment") {
    val before = Sampling.splitByCluster(docs, "doc_id", clusters,
        "doc_id", "canonical_id", splits)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    val grown = Sampling.splitByCluster((1L to 80L).toDF("doc_id"), "doc_id",
        clusters, "doc_id", "canonical_id", splits)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    assert(grown.size == 80)
    before.foreach { case (id, s) => assert(grown(id) == s, s"doc $id moved") }
  }

  test("a new member joining a cluster inherits the cluster's split") {
    val biggerCluster = clusters
      .union(Seq((39L, 1L)).toDF("doc_id", "canonical_id"))
    val out = Sampling.splitByCluster(docs, "doc_id", biggerCluster,
        "doc_id", "canonical_id", splits)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    assert(out(39L) == out(1L))
  }
}
