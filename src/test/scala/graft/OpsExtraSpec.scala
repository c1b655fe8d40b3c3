package graft

import graft.operators.Snapshots
import graft.functions.Hashes
import org.apache.spark.sql.functions._

/** Salted dedup equivalence + JSON skills codec round-trip. */
class OpsExtraSpec extends SparkSpec {
  import spark.implicits._

  test("salted dedup equals unsalted dedup, including on a skewed key") {
    // one hot key with 5000 rows + 50 normal keys
    val rows = (1 to 5000).map(i => ("hot", i % 3, i.toLong)) ++
      (1 to 50).flatMap(k => (1 to 4).map(i => (s"k$k", i % 2, (k * 10 + i).toLong)))
    val df = rows.toDF("k", "prio", "tb")
    val plain = Snapshots.dedupByPriority(df, Seq("k"), col("prio"), col("tb"))
      .orderBy("k").collect().toSeq
    val salted = Snapshots.dedupByPrioritySalted(df, Seq("k"), 16, col("prio"), col("tb"))
      .orderBy("k").collect().toSeq
    assert(plain == salted)
  }

  test("skills JSON codec round-trips arrays and unicode") {
    val df = Seq(Seq("Python", "Kỹ Sư", "C++")).toDF("skills")
    val json = df.select(Hashes.skillsToJson(col("skills")).as("j"))
    assert(json.head().getString(0) == """["Python","Kỹ Sư","C++"]""")
    val back = json.select(Hashes.skillsFromJson(col("j")).as("s"))
      .head().getSeq[String](0)
    assert(back == Seq("Python", "Kỹ Sư", "C++"))
  }
}
