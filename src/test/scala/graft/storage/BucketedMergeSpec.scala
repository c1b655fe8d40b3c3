package graft.storage

import graft.SparkSpec
import graft.operators.Merge
import org.apache.spark.sql.functions._

/** Proves the scale claim in Merge.scala: with both sides bucketed on
  * the key, the full-outer merge join runs WITHOUT a shuffle exchange.
  */
class BucketedMergeSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed upsert join has no shuffle exchange on the key") {
    val existing = (1 to 1000).map(i => (i.toLong, s"n$i", i * 1.0))
      .toDF("id", "name", "v")
    val incoming = (500 to 1500).map(i => (i.toLong, s"n$i", i * 2.0))
      .toDF("id", "name", "v")
    TableStore.writeBucketed(existing, "bm_existing", Seq("id"), 8)
    TableStore.writeBucketed(incoming, "bm_incoming", Seq("id"), 8)

    // force the sort-merge path (tiny test frames would broadcast)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val merged = Merge.upsert(
        spark.table("bm_existing"), spark.table("bm_incoming"),
        Seq("id"), Seq("name", "v"))
      val plan = merged.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(500))
      assert(!plan.contains("Exchange hashpartitioning"),
        "bucketed join must not reshuffle:\n" + plan.take(1200))

      // and it is still CORRECT
      val out = merged.collect()
      assert(out.length == 1500)
      val classes = merged.groupBy(Merge.ClassCol).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(classes("inserted") == 500)   // 1001..1500
      assert(classes("updated") == 501)    // 500..1000 (v changed)
      assert(classes("untouched") == 499)  // 1..499
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.sql("DROP TABLE IF EXISTS bm_existing")
      spark.sql("DROP TABLE IF EXISTS bm_incoming")
    }
  }
}
