package graft.operators

import graft.SparkSpec
import graft.llm.CapStats
import org.apache.spark.sql.functions._

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  test("two-table linkage: phonetic blocking pairs variants, scores gate") {
    val master = Seq((1L, "Jon Smith Software"), (2L, "Acme Corp"),
      (3L, "Zeta Industries")).toDF("m_id", "m_name")
    val dirty = Seq((10L, "John Smith Software"), (11L, "Acme Corpp"),
      (12L, "Beta Industries"), (13L, "Jon Smith Software"))
      .toDF("d_id", "d_name")
    val out = Linkage.linkageJoin(master, "m_id", "m_name",
        dirty, "d_id", "d_name", threshold = 0.9)
      .orderBy("m_id", "d_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(4)))
    // Jon/John share soundex(J500); Acme/Acme Corpp share A250;
    // Beta blocks apart from Zeta (B300 vs Z300... different letters)
    assert(out.map(t => (t._1, t._2)).toSeq ==
      Seq((1L, 10L), (1L, 13L), (2L, 11L)))
    // the exact-duplicate name scores 1.0
    assert(out.find(t => t._2 == 13L).get._3 == 1.0)
    assert(out.forall(_._3 >= 0.9))
  }

  test("self form: smaller id first, diagonal dropped, dup names kept once") {
    val t = Seq((1L, "spark engine"), (2L, "spark engnie"),
      (3L, "spark engine"), (4L, "flink engine")).toDF("x", "n")
    val a = t.toDF("a_id", "a_n")
    val b = t.toDF("b_id", "b_n")
    val out = Linkage.linkageJoin(a, "a_id", "a_n", b, "b_id", "b_n",
        threshold = 0.95, blocker = Linkage.prefixBlock(2), selfPairs = true)
      .orderBy("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(4)))
    // pairs: (1,2) transposition 0.983333; (1,3) identical 1.0;
    // (2,3) 0.983333; flink blocks apart (FL vs SP)
    assert(out.map(t => (t._1, t._2)).toSeq ==
      Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(out.forall(t => t._1 < t._2))
    assert(out.find(t => (t._1, t._2) == ((1L, 3L))).get._3 == 1.0)
  }

  test("goldenRecord: modal value wins, ties go smallest, all-null stays null") {
    val records = Seq(
      (1L, "Acme Corp", "NY", null: String),
      (2L, "Acme Corp", "SF", null: String),
      (3L, "Acme Corpp", null: String, null: String),
      (10L, "Zeta", "LA", "z")).toDF("id", "name", "city", "notes")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L))
      .toDF("id", "canonical_id")
    val out = Linkage.goldenRecord(records, "id", clusters,
        Seq("name", "city", "notes"))
      .orderBy("canonical_id").collect()
    val acme = out(0)
    assert(acme.getLong(1) == 3L)                       // n_members
    assert(acme.getString(2) == "Acme Corp")            // 2-vs-1 mode
    assert(acme.getString(3) == "NY")                   // 1-1 tie → smallest
    assert(acme.isNullAt(4))                            // all-null field
    val zeta = out(1)
    assert(zeta.getLong(1) == 1L && zeta.getString(2) == "Zeta" &&
      zeta.getString(4) == "z")
  }

  test("resolveEntities: transitive variants collapse to one golden row") {
    // a—b link and b—c link but a—c alone would miss: transitivity test
    val records = Seq(
      (1L, "spark engine corp", "NY"),
      (2L, "spark engine corpx", "NY"),
      (3L, "spark engine corpxy", "SF"),
      (9L, "flink runtime gmbh", "B")).toDF("id", "name", "city")
    val out = Linkage.resolveEntities(records, "id", "name",
        // 0.985 sits between the direct a—c sim (0.9789) and the
        // chained sims (0.9889, 0.9895): only transitivity merges all 3
        Seq("name", "city"), threshold = 0.985,
        blocker = Linkage.prefixBlock(2))
      .orderBy("canonical_id").collect()
    assert(out.length == 2)
    assert(out(0).getLong(0) == 1L && out(0).getLong(1) == 3L)
    assert(out(0).getString(3) == "NY")      // 2-vs-1 modal city
    assert(out(1).getLong(0) == 9L && out(1).getLong(1) == 1L)
  }

  test("hot blocks are capped with the loss accounted") {
    val many = (1 to 50).map(i => (i.toLong, s"aa name $i")).toDF("i", "n")
    val a = many.toDF("a_id", "a_n")
    val b = many.toDF("b_id", "b_n")
    val cs = new CapStats
    val out = Linkage.linkageJoin(a, "a_id", "a_n", b, "b_id", "b_n",
      threshold = 0.5, blocker = Linkage.prefixBlock(2), selfPairs = true,
      maxBucket = 10, capStats = Some(cs))
    assert(out.count() == 0L)
    assert(cs.droppedBuckets == 1L && cs.droppedRows == 100L)
  }
}
