package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AssocSpec extends SparkSpec {
  import spark.implicits._

  // baskets: u1{x,y}, u2{x,y}, u3{x,z}, u4{y} — repeats must not inflate
  private val log = Seq(
    (1L, "x"), (1L, "y"), (1L, "x"),
    (2L, "x"), (2L, "y"),
    (3L, "x"), (3L, "z"),
    (4L, "y")).toDF("u", "item")

  test("associationRules: counts, support, confidence, lift") {
    val out = Assoc.associationRules(log, "u", "item")
      .orderBy("item_a", "item_b").collect()
    val xy = out.find(r => r.getString(0) == "x" && r.getString(1) == "y").get
    assert(xy.getLong(2) == 3L)  // n_a: x in 3 baskets
    assert(xy.getLong(3) == 3L)  // n_b: y in 3 baskets
    assert(xy.getLong(4) == 2L)  // n_ab
    assert(xy.getLong(5) == 4L)  // n_baskets
    assert(xy.getDouble(6) == 0.5)            // support 2/4
    assert(xy.getDouble(7) == 2.0 / 3.0)      // conf x->y
    assert(xy.getDouble(8) == 2.0 / 3.0)      // conf y->x
    assert(xy.getDouble(9) == 8.0 / 9.0)      // lift 2*4/(3*3)
    val xz = out.find(r => r.getString(0) == "x" && r.getString(1) == "z").get
    assert(xz.getLong(4) == 1L)
    assert(xz.getDouble(9) == 4.0 / 3.0)
    // y,z never co-occur — no row
    assert(!out.exists(r => r.getString(0) == "y" && r.getString(1) == "z"))
  }

  test("associationRules: minCount prunes the rare tail") {
    val out = Assoc.associationRules(log, "u", "item", minCount = 2L)
      .collect()
    assert(out.length == 1)
    assert(out(0).getString(0) == "x" && out(0).getString(1) == "y")
  }

  test("associationRules: null baskets and items are ignored") {
    val withNulls = log.union(Seq(
      (Option.empty[Long], Option("x")),
      (Option(5L), Option.empty[String])
    ).toDF("u", "item").select(col("u").cast("long"), col("item")))
    val base = Assoc.associationRules(log, "u", "item").collect().toSet
    val got = Assoc.associationRules(withNulls, "u", "item").collect().toSet
    assert(got == base)
  }
}
