package graft.operators

import graft.SparkSpec
import graft.llm.CapStats
import org.apache.spark.sql.functions._

class FuzzySpec extends SparkSpec {
  import spark.implicits._

  private def variants(s: String, d: Int): Set[String] =
    Seq(s).toDF("s")
      .select(Fuzzy.deletionVariants(col("s"), d).as("v"))
      .as[Seq[String]].head().toSet

  test("deletionVariants enumerates every <=d-deletion string, distinct") {
    assert(variants("ab", 0) == Set("ab"))
    assert(variants("ab", 1) == Set("ab", "a", "b"))
    assert(variants("ab", 2) == Set("ab", "a", "b", ""))
    assert(variants("abc", 1) == Set("abc", "bc", "ac", "ab"))
    assert(variants("abc", 2) ==
      Set("abc", "bc", "ac", "ab", "a", "b", "c"))
    // duplicate letters collapse: deleting either 'a' of "aa" gives "a"
    assert(variants("aa", 1) == Set("aa", "a"))
    assert(variants("", 2) == Set(""))
  }

  private val canon = Seq(
    (1L, "red widget"), (2L, "blue bolt"), (3L, "red gadget"))
    .toDF("cid", "cname")
  private val dirty = Seq(
    (10L, "red widgt"),   // 1 deletion from "red widget"
    (11L, "red widgets"), // 1 insertion
    (12L, "bue bolt"),    // 1 deletion from "blue bolt"
    (13L, "red gadget"),  // exact
    (14L, "green gear"))  // matches nothing at d=2
    .toDF("did", "dname")

  private def matchSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
    df.select("did", "cid", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("editJoin equals the brute-force levenshtein scan (recall 1)") {
    val out = Fuzzy.editJoin(dirty, "did", "dname", canon, "cid", "cname", d = 2)
    val brute = dirty.crossJoin(canon)
      .withColumn("dist", levenshtein(col("dname"), col("cname")))
      .where(col("dist") <= 2)
    assert(matchSet(out) == matchSet(brute))
    // and the known pairs are exactly these
    assert(matchSet(out) == Set(
      (10L, 1L, 1), (11L, 1L, 1), (12L, 2L, 1), (13L, 3L, 0),
      (13L, 1L, 2))) // "red gadget" vs "red widget" is itself distance 2
  }

  test("editJoin at d=1 misses nothing within 1 and admits nothing at 2") {
    val out = Fuzzy.editJoin(dirty, "did", "dname", canon, "cid", "cname", d = 1)
    val brute = dirty.crossJoin(canon)
      .withColumn("dist", levenshtein(col("dname"), col("cname")))
      .where(col("dist") <= 1)
    assert(matchSet(out) == matchSet(brute))
  }

  test("selfPairs keeps each unordered pair once, no diagonal") {
    val names = Seq((1L, "old rod"), (2L, "red rod"), (3L, "red rods"))
      .toDF("id", "name")
    val out = Fuzzy.editJoin(names, "id", "name",
      names.toDF("id2", "name2"), "id2", "name2", d = 2, selfPairs = true)
    val got = out.select("id", "id2", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // ed(old rod, red rod)=2; ed(red rod, red rods)=1; ed(old rod, red rods)=3
    assert(got == Set((1L, 2L, 2), (2L, 3L, 1)))
  }

  test("hot signatures are capped and the loss is counted") {
    // 30 single-char strings: d=2 variants of each include "" — a
    // signature every row shares, well past maxBucket=10
    val many = (1L to 30L).map(i => (i, ('a' + (i % 26)).toChar.toString))
      .toDF("id", "s")
    val stats = new CapStats
    val out = Fuzzy.editJoin(many, "id", "s",
      many.toDF("id2", "s2"), "id2", "s2",
      d = 2, selfPairs = true, maxBucket = 10, capStats = Some(stats))
    out.collect() // force the job
    assert(stats.droppedBuckets >= 1L)
    assert(stats.droppedRows > 10L)
  }

  test("null strings never match and never throw") {
    val withNull = Seq((1L, "abc"), (2L, null.asInstanceOf[String]))
      .toDF("id", "s")
    val out = Fuzzy.editJoin(withNull, "id", "s", canon, "cid", "cname", d = 2)
    assert(out.count() == 0L)
  }
}
