package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DpoSpec extends SparkSpec {
  import spark.implicits._

  private def cands = Seq(
    // group "a": clear best (id 3) and worst (id 1)
    ("a", 1L, 0.1), ("a", 2L, 0.5), ("a", 3L, 0.9),
    // group "b": best score tied between 10 and 11 -> lowest id 10 chosen;
    // worst tied between 12 and 13 -> lowest id 12 rejected
    ("b", 10L, 0.8), ("b", 11L, 0.8), ("b", 12L, 0.1), ("b", 13L, 0.1),
    // group "c": single candidate -> no pair
    ("c", 20L, 0.7),
    // group "d": all tied -> no preference signal -> no pair
    ("d", 30L, 0.4), ("d", 31L, 0.4)).toDF("g", "id", "score")

  test("best-vs-worst per group with lowest-id tiebreaks; degenerate groups drop") {
    val out = Dpo.preferencePairs(cands, Seq("g"), "id", "score")
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(5)))
    assert(out === Array(
      ("a", 3L, 1L, 0.9 - 0.1),
      ("b", 10L, 12L, 0.8 - 0.1)))
  }

  test("margin prunes weak-gap pairs") {
    val out = Dpo.preferencePairs(cands, Seq("g"), "id", "score",
      margin = 0.71).collect()
    assert(out.map(_.getString(0)).toSeq === Seq("a")) // b's gap 0.7 < 0.71
  }

  test("attachTexts carries the payload for both sides only") {
    val docs = Seq((1L, "t1"), (2L, "t2"), (3L, "t3"))
      .toDF("id", "text")
    val pairs = Dpo.preferencePairs(
      cands.filter(col("g") === "a"), Seq("g"), "id", "score")
    val out = Dpo.attachTexts(pairs, docs, "id", "text").collect().head
    assert(out.getAs[String]("chosen_text") === "t3")
    assert(out.getAs[String]("rejected_text") === "t1")
  }

  test("bestOfN keeps the top candidate per group at or above minScore") {
    val out = Dpo.bestOfN(cands, Seq("g"), "id", "score", minScore = 0.5)
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // a: 0.9 survivor of 3; b: tie at 0.8 -> lowest id 10, survivor of 4;
    // c: 0.7 single; d: 0.4 < 0.5 -> gated out
    assert(out === Array(
      ("a", 3L, 0.9, 3L), ("b", 10L, 0.8, 4L), ("c", 20L, 0.7, 1L)))
  }

  test("groupAdvantage z-scores within the group; constant groups pin to 0") {
    val out = Dpo.groupAdvantage(cands, Seq("g"), "id", "score")
      .orderBy("id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(4)))
    val byId = out.map(t => t._2 -> t._3).toMap
    // group a: scores 0.1/0.5/0.9 -> mean 0.5, sd = sqrt(m2 - 0.25)
    val m2 = (0.1 * 0.1 + 0.5 * 0.5 + 0.9 * 0.9) / 3.0
    val sd = math.sqrt(m2 - 0.25)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(byId(1L) === r6((0.1 - 0.5) / sd))
    assert(byId(2L) === 0.0)
    assert(byId(3L) === r6((0.9 - 0.5) / sd))
    // group d (all 0.4, sd = 0) and group c (singleton) pin to 0.0
    assert(byId(20L) === 0.0 && byId(30L) === 0.0 && byId(31L) === 0.0)
    // advantages within a group sum to ~0 (it is a centered z-score)
    val aSum = out.filter(_._1 == "a").map(_._3).sum
    assert(math.abs(aSum) < 1e-5)
  }

  test("pairing is invariant under input partitioning and row order") {
    val a = Dpo.preferencePairs(cands, Seq("g"), "id", "score")
      .orderBy("g").collect().toSeq
    val b = Dpo.preferencePairs(
        cands.repartition(7).sortWithinPartitions(col("score").desc),
        Seq("g"), "id", "score")
      .orderBy("g").collect().toSeq
    assert(a === b)
  }
}
