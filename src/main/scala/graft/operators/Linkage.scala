package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.expressions.JaroWinkler
import graft.llm.CapStats

/** Blocked record linkage (entity resolution): pair candidates through a
  * cheap BLOCKING key, score survivors with the codegen'd
  * [[graft.expressions.JaroWinkler]] kernel, keep pairs at or above a
  * similarity threshold — the classic blocking + scoring split every
  * dedup/master-data system runs when "same entity" is a graded
  * judgment rather than an edit-distance bound.
  *
  * Contrast with [[Fuzzy.editJoin]]: editJoin GUARANTEES recall for
  * `levenshtein ≤ d ≤ 2`; linkage accepts the standard blocking
  * trade — two records whose blocking keys differ are never compared —
  * in exchange for an arbitrary-threshold normalized score and O(block)
  * candidate volume. Pick the blocker to match the error model
  * ([[soundexFirstWord]] survives tail typos and vowel variation;
  * a prefix blocker survives suffix edits).
  *
  * Scale shape (mirrors editJoin): each side collapses to DISTINCT
  * strings first, so blocking, scoring and thresholding all see
  * string-domain volume; one equi-shuffle per side on the block key;
  * hot blocks governed by `maxBucket` through the same
  * combined-occupancy cap + [[CapStats]] audit as the other candidate
  * generators (unconditional — silent candidate loss is impossible);
  * two final hash joins expand surviving string pairs to id pairs.
  * No window, no all-pairs beyond the capped blocks.
  */
object Linkage {

  /** Default blocker: Spark's codegen'd `soundex` of the first
    * whitespace token, uppercased — phonetic on the leading word,
    * indifferent to everything after it. */
  def soundexFirstWord(c: Column): Column =
    soundex(upper(substring_index(trim(c), " ", 1)))

  /** Uppercased first-`n`-character blocker — the SQL-portable choice
    * (the linkage gate's oracle restates it verbatim). */
  def prefixBlock(n: Int)(c: Column): Column = upper(substring(c, 1, n))

  /** Pairs `(left, right)` with `jaro_winkler(lStr, rStr) ≥ threshold`
    * among candidates sharing a blocking key, published as
    * `(lId, lStr, rId, rStr, sim)` with `sim` rounded to 6 dp (the
    * cross-engine render). Ids must be non-null and unique per side;
    * null strings never match. Output column names must differ between
    * the sides — rename upstream.
    *
    * `selfPairs = true` treats the inputs as one relation (pass a
    * renamed copy): each unordered id pair is kept once, published with
    * the SMALLER id on the left, diagonal dropped — equal strings
    * (sim 1) are real duplicate names and ARE published.
    */
  def linkageJoin(left: DataFrame, lId: String, lStr: String,
                  right: DataFrame, rId: String, rStr: String,
                  threshold: Double,
                  blocker: Column => Column = soundexFirstWord,
                  selfPairs: Boolean = false,
                  maxBucket: Int = 10000,
                  capStats: Option[CapStats] = None): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    require(lId != rId && lStr != rStr,
      s"output columns collide ($lId/$rId, $lStr/$rStr) — rename one side " +
        "(df.toDF(...)) first; for selfPairs pass a renamed copy of the same frame")
    def names(side: DataFrame, strCol: String, outName: String): DataFrame =
      side.select(col(strCol).as(outName)).where(col(outName).isNotNull)
        .distinct()
        .withColumn("__blk", blocker(col(outName)))
    val l = names(left, lStr, "__ls")
    val r = names(right, rStr, "__rs")
    val occ = l.groupBy("__blk").agg(count(lit(1)).as("__nl"))
      .join(r.groupBy("__blk").agg(count(lit(1)).as("__nr")),
        Seq("__blk"), "full_outer")
      .select(col("__blk"),
        (coalesce(col("__nl"), lit(0L)) + coalesce(col("__nr"), lit(0L)))
          .as("__n"))
    val hot = occ.filter(col("__n") > maxBucket)
    val row = hot.agg(count(lit(1)), coalesce(sum(col("__n")), lit(0L))).head()
    capStats match {
      case Some(cs) =>
        cs.droppedBuckets = row.getLong(0)
        cs.droppedRows = row.getLong(1)
      case None if row.getLong(0) > 0 =>
        System.err.println(s"WARN Linkage.linkageJoin: ${row.getLong(0)} hot " +
          s"block(s) over maxBucket=$maxBucket dropped (${row.getLong(1)} " +
          "strings) — candidates lost; pass capStats or raise maxBucket")
      case None => ()
    }
    val lc = l.join(hot.select("__blk"), Seq("__blk"), "left_anti")
    val rc = r.join(hot.select("__blk"), Seq("__blk"), "left_anti")
    // one block key per string → a string pair arises at most once; the
    // self form generates each unordered STRING pair once (equal strings
    // included — their id pairs are true duplicate names)
    val pairFilter = if (selfPairs) col("__ls") <= col("__rs") else lit(true)
    val scored = lc.join(rc, Seq("__blk"))
      .where(pairFilter)
      .withColumn("sim",
        round(JaroWinkler.jaro_winkler(col("__ls"), col("__rs")), 6))
      .where(col("sim") >= threshold)
      .select("__ls", "__rs", "sim")
    val expanded = scored
      .join(left.select(col(lId).as("__lid"), col(lStr).as("__ls")), Seq("__ls"))
      .join(right.select(col(rId).as("__rid"), col(rStr).as("__rs")), Seq("__rs"))
    val out =
      if (!selfPairs) expanded
      else {
        val kept = expanded.where(
          (col("__ls") =!= col("__rs")) || (col("__lid") < col("__rid")))
        kept.select(
          when(col("__lid") < col("__rid"),
            struct(col("__lid"), col("__ls"), col("__rid"), col("__rs")))
            .otherwise(struct(col("__rid").as("__lid"), col("__rs").as("__ls"),
              col("__lid").as("__rid"), col("__ls").as("__rs"))).as("__p"),
          col("sim"))
          .select(col("__p.__lid").as("__lid"), col("__p.__ls").as("__ls"),
            col("__p.__rid").as("__rid"), col("__p.__rs").as("__rs"),
            col("sim"))
      }
    out.select(col("__lid").as(lId), col("__ls").as(lStr),
      col("__rid").as(rId), col("__rs").as(rStr), col("sim"))
  }

  /** The full entity-resolution composition — what an MDM consumer
    * actually runs, wired from the gated pieces: [[linkageJoin]] self
    * pairs over `strCol` → connected components
    * ([[graft.llm.Dedup.resolveClusters]]: min-label propagation /
    * bounded union-find) → [[goldenRecord]] survivor policy. One
    * canonical row per resolved entity.
    */
  def resolveEntities(records: DataFrame, idCol: String, strCol: String,
                      fields: Seq[String], threshold: Double,
                      blocker: Column => Column = soundexFirstWord,
                      maxBucket: Int = 10000,
                      capStats: Option[CapStats] = None): DataFrame = {
    // Edges are built at the NAME level, never as id-level cliques: a
    // popular exact name (k records) contributes k−1 member→rep star
    // edges instead of the k²/2 clique the raw linkage id expansion
    // would emit (measured: the clique form went 24× at 10× data —
    // quadratic in per-name multiplicity). Connectivity is identical —
    // equal-name records are complete through their representative,
    // cross-name links connect the representatives — so components,
    // min-id canonicals and the golden output are unchanged.
    val reps = records.where(col(strCol).isNotNull)
      .groupBy(col(strCol).as("__s")).agg(min(col(idCol)).as("__rep"))
    val a = reps.select(col("__rep").as("__ea"), col("__s").as("__sa"))
    val b = reps.select(col("__rep").as("__eb"), col("__s").as("__sb"))
    val namePairs = linkageJoin(a, "__ea", "__sa", b, "__eb", "__sb",
        threshold, blocker, selfPairs = true, maxBucket, capStats)
      .filter(col("__sa") =!= col("__sb")) // reps are distinct names
      .select(col("__ea").as("id_a"), col("__eb").as("id_b"))
    val memberEdges = records
      .join(reps, records(strCol) === reps("__s"))
      .where(col(idCol) =!= col("__rep"))
      .select(col(idCol).as("id_a"), col("__rep").as("id_b"))
    val pairs = namePairs.unionByName(memberEdges)
    val clusters = graft.llm.Dedup.resolveClusters(pairs, records, idCol)
    goldenRecord(records, idCol, clusters, fields)
  }

  /** Golden-record consolidation — the MDM step after matching: records
    * grouped by their resolved cluster ([[linkageJoin]] /
    * [[Fuzzy.editJoin]] pairs through
    * [[graft.llm.Dedup.resolveClusters]], or any `(idCol,
    * canonical_id)` assignment) publish ONE canonical row per entity:
    * per field, the MODAL non-null value among the members, ties broken
    * by the smallest value — deterministic, no "first row wins"
    * partition sensitivity. Fields are compared and published as
    * strings (the survivor-policy domain); a field null across every
    * member stays null.
    *
    * Output: `(canonical_id, n_members, <fields…>)`.
    *
    * Scale shape: one melt explode (|fields|× narrow), one
    * `(cluster, field, value)` partial-agg count, one rank-filtered
    * window (`InferWindowGroupLimit` ships one winner per
    * (cluster, field) per map task), one per-cluster pivot agg — no
    * all-pairs, state bounded by per-cluster distinct values.
    */
  def goldenRecord(records: DataFrame, idCol: String, clusters: DataFrame,
                   fields: Seq[String]): DataFrame = {
    require(fields.nonEmpty, "goldenRecord needs at least one field")
    val joined = records
      .join(clusters.select(col(idCol), col("canonical_id")), Seq(idCol))
    val members = joined.groupBy(col("canonical_id"))
      .agg(count(lit(1)).as("n_members"))
    val melted = joined.select(col("canonical_id"),
        explode(array(fields.map(f =>
          struct(lit(f).as("f"), col(f).cast("string").as("v"))): _*)).as("kv"))
      .select(col("canonical_id"), col("kv.f").as("__f"), col("kv.v").as("__v"))
      .where(col("__v").isNotNull)
    val counts = melted.groupBy(col("canonical_id"), col("__f"), col("__v"))
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(col("canonical_id"), col("__f"))
      .orderBy(col("__c").desc, col("__v").asc)
    val winners = counts.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
    val golden = winners.groupBy(col("canonical_id"))
      .agg(max(when(col("__f") === fields.head, col("__v"))).as(fields.head),
        fields.tail.map(f =>
          max(when(col("__f") === f, col("__v"))).as(f)): _*)
    members.join(golden, Seq("canonical_id"), "left")
  }
}
