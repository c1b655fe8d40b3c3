package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChecksumSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq(
    (1L, "a", Some("x")), (2L, "b", None), (3L, "a", Some("y")))
    .toDF("id", "g", "v")

  test("checksum is invariant under row order and partitioning") {
    val a = Checksum.global(base, Seq("id", "g", "v")).head()
    val b = Checksum.global(base.orderBy(desc("id")).repartition(7),
      Seq("id", "g", "v")).head()
    assert(a == b)
    assert(a.getAs[Long]("n_rows") == 3L)
  }

  test("any cell change, row loss, or duplication moves the checksum") {
    val ref = Checksum.global(base, Seq("id", "g", "v")).head().getAs[Long]("checksum")
    val mutated = Checksum.global(
      base.withColumn("v", when(col("id") === 1, "z").otherwise(col("v"))),
      Seq("id", "g", "v")).head().getAs[Long]("checksum")
    val dropped = Checksum.global(base.filter(col("id") =!= 2),
      Seq("id", "g", "v")).head().getAs[Long]("checksum")
    val doubled = Checksum.global(base.unionAll(base.filter(col("id") === 3)),
      Seq("id", "g", "v")).head().getAs[Long]("checksum")
    assert(Set(mutated, dropped, doubled).forall(_ != ref))
  }

  test("null is distinct from empty string; field boundaries matter") {
    val n = Checksum.global(Seq((1L, Option.empty[String])).toDF("id", "v"),
      Seq("id", "v")).head().getAs[Long]("checksum")
    val e = Checksum.global(Seq((1L, "")).toDF("id", "v"),
      Seq("id", "v")).head().getAs[Long]("checksum")
    assert(n != e)
    val ab = Checksum.global(Seq(("a", "b")).toDF("x", "y"),
      Seq("x", "y")).head().getAs[Long]("checksum")
    val a_b = Checksum.global(Seq(("ab", "")).toDF("x", "y"),
      Seq("x", "y")).head().getAs[Long]("checksum")
    assert(ab != a_b)
  }

  test("raw double columns are rejected; decimal cast is accepted") {
    val d = Seq((1L, 1.5)).toDF("id", "x")
    val e = intercept[IllegalArgumentException] {
      Checksum.global(d, Seq("id", "x"))
    }
    assert(e.getMessage.contains("decimal"))
    val ok = Checksum.global(d.withColumn("x", col("x").cast("decimal(10,2)")),
      Seq("id", "x")).head()
    assert(ok.getAs[Long]("n_rows") == 1L)
  }

  test("grouped checksum aggregates map-side (partial before the shuffle)") {
    val p = Checksum.grouped(base, Seq("g"), Seq("id", "v"))
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_"), p.take(600))
  }
}
