package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.llm.CapStats

/** Fuzzy string join: all pairs within Levenshtein distance ≤ `d`
  * (d ∈ {1, 2}) — the record-linkage / entity-resolution primitive
  * behind "does this scraped company name match a canonical one?"
  * (the reference cleans company names, `etl/utils.py`
  * clean_company_name, but matches them only exactly; this is the
  * fuzzy upgrade).
  *
  * Candidates come from symmetric-delete signatures (the SymSpell
  * scheme): if ed(s, t) ≤ d then an optimal alignment deletes ≤ d chars
  * from EACH side to reach a common subsequence, so every true pair
  * shares at least one of the O(len^d) deletion variants. Signature
  * equality is an equi-join — one hash shuffle per side — and recall is
  * exactly 1 by the alignment argument PROVIDED no signature bucket hit
  * the `maxBucket` cap (a capped signature drops the true pairs that
  * only share it — e.g. many distinct short strings all reaching the
  * empty-string signature at d = 2). The occupancy audit always runs:
  * a passed [[graft.llm.CapStats]] receives the loss counts, and with
  * no sink a nonzero loss is logged loudly instead of vanishing. The
  * exact `levenshtein` post-filter (threshold form: banded DP,
  * O(d·len) per pair) removes false candidates, so on an uncapped run
  * the result is identical to the all-pairs scan that would be
  * |L|·|R| at scale.
  *
  * Scale shape: everything expensive runs on the DISTINCT-string
  * domain. Real corpora repeat names (20k scraped rows over a few
  * hundred company spellings), so each side is collapsed to its
  * distinct strings first; signatures (Σ O(len²) per distinct string
  * at d = 2 — names and titles, not documents), the candidate join,
  * the dedup, and the levenshtein verify all see string-domain volume,
  * and two final hash joins expand verified string pairs back to id
  * pairs. On all-unique inputs the distinct is one wasted shuffle;
  * on realistic ones it shrinks the pipeline by the duplication
  * factor. Hot signatures (a variant shared by many DISTINCT strings)
  * are governed by `maxBucket`, counted through the same
  * [[graft.llm.CapStats]] channel as the LSH cap sites.
  */
object Fuzzy {

  /** All strings reachable from `s` by at most `d` character deletions,
    * `s` itself included, distinct. Pure builtin higher-order functions
    * (codegen'd) — no UDF: position sequences + `substr` splicing.
    */
  def deletionVariants(s: Column, d: Int): Column = {
    require(d >= 0 && d <= 2, s"deletion depth must be 0..2, got $d")
    def del1(v: Column): Column =
      when(length(v) <= 0, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), length(v)), i =>
          concat(v.substr(lit(1), i - 1), v.substr(i + 1, length(v)))))
    val base = array(s)
    val out = d match {
      case 0 => base
      case 1 => concat(base, del1(s))
      case _ =>
        val one = del1(s)
        concat(base, one, flatten(transform(one, v => del1(v))))
    }
    array_distinct(out)
  }

  /** Distinct non-null strings of `side(strCol)` exploded onto their
    * deletion signatures. */
  private def signatures(side: DataFrame, strCol: String,
                         outName: String, d: Int): DataFrame =
    side.select(col(strCol).as(outName)).where(col(outName).isNotNull)
      .distinct()
      .withColumn("__sig", explode(deletionVariants(col(outName), d)))

  /** Pairs `(left, right)` with `levenshtein(lStr, rStr) ≤ d`, published
    * as (lId, lStr, rId, rStr, dist). Ids must be non-null and unique
    * per side; null strings never match (SQL comparison semantics).
    * Output column names must differ between the sides — rename
    * upstream (`df.toDF(...)`).
    *
    * `selfPairs = true` treats the two inputs as the same relation
    * (pass a renamed copy) and keeps each unordered id pair once,
    * published with the SMALLER id on the left and the diagonal
    * dropped — the "find near-duplicate names within one table" form.
    */
  def editJoin(left: DataFrame, lId: String, lStr: String,
               right: DataFrame, rId: String, rStr: String,
               d: Int, selfPairs: Boolean = false,
               maxBucket: Int = 10000,
               capStats: Option[CapStats] = None): DataFrame = {
    require(d >= 1 && d <= 2, s"edit distance bound must be 1 or 2, got $d")
    require(lId != rId && lStr != rStr,
      s"output columns collide ($lId/$rId, $lStr/$rStr) — rename one side " +
        "(df.toDF(...)) first; for selfPairs pass a renamed copy of the same frame")
    val l = signatures(left, lStr, "__ls", d)
    val r = signatures(right, rStr, "__rs", d)
    // combined-occupancy cap, same contract as the LSH cap sites: a
    // signature whose total distinct-string fan-in exceeds `maxBucket`
    // is dropped everywhere, its loss counted — never silently stalled on
    val occ = l.groupBy("__sig").agg(count(lit(1)).as("__nl"))
      .join(r.groupBy("__sig").agg(count(lit(1)).as("__nr")),
        Seq("__sig"), "full_outer")
      .select(col("__sig"),
        (coalesce(col("__nl"), lit(0L)) + coalesce(col("__nr"), lit(0L)))
          .as("__n"))
    val hot = occ.filter(col("__n") > maxBucket)
    // the audit is unconditional: capped signatures break the recall-1
    // contract, so the loss is either handed to the caller's sink or
    // logged loudly — never silent
    val row = hot.agg(count(lit(1)), coalesce(sum(col("__n")), lit(0L))).head()
    capStats match {
      case Some(cs) =>
        cs.droppedBuckets = row.getLong(0)
        cs.droppedRows = row.getLong(1)
      case None if row.getLong(0) > 0 =>
        System.err.println(s"WARN Fuzzy.editJoin: ${row.getLong(0)} hot " +
          s"signature bucket(s) over maxBucket=$maxBucket dropped " +
          s"(${row.getLong(1)} signature rows) — recall < 1; pass capStats " +
          "to account for the loss or raise maxBucket")
      case None => ()
    }
    val lc = l.join(hot.select("__sig"), Seq("__sig"), "left_anti")
    val rc = r.join(hot.select("__sig"), Seq("__sig"), "left_anti")
    // the |len(s) − len(t)| ≤ d bound is free and prunes hopeless pairs
    // before the distinct; the self form keeps each unordered STRING
    // pair once (equal strings included — their id pairs are real
    // near-dups at distance 0)
    val lengthBound = abs(length(col("__ls")) - length(col("__rs"))) <= d
    val pairFilter =
      if (selfPairs) col("__ls") <= col("__rs") && lengthBound
      else lengthBound
    val candNames = lc.join(rc, Seq("__sig"))
      .where(pairFilter)
      .select("__ls", "__rs").distinct()
    val verified = candNames
      .withColumn("dist", levenshtein(col("__ls"), col("__rs"), d))
      .where(col("dist") >= 0)
    // expand verified STRING pairs back to id pairs: two hash joins on
    // the string key — each true id pair appears exactly once because
    // the name-level pair set is distinct and one-directional
    val expanded = verified
      .join(left.select(col(lId).as("__lid"), col(lStr).as("__ls")), Seq("__ls"))
      .join(right.select(col(rId).as("__rid"), col(rStr).as("__rs")), Seq("__rs"))
    val out =
      if (!selfPairs) expanded
      else {
        // same-string pairs expand to the full id square: keep one
        // triangle; cross-string pairs were generated once at string
        // level, so normalize to smaller-id-first instead of dropping
        val kept = expanded.where(
          (col("__ls") =!= col("__rs")) || (col("__lid") < col("__rid")))
        kept.select(
          when(col("__lid") < col("__rid"),
            struct(col("__lid"), col("__ls"), col("__rid"), col("__rs")))
            .otherwise(struct(col("__rid").as("__lid"), col("__rs").as("__ls"),
              col("__lid").as("__rid"), col("__ls").as("__rs"))).as("__p"),
          col("dist"))
          .select(col("__p.__lid").as("__lid"), col("__p.__ls").as("__ls"),
            col("__p.__rid").as("__rid"), col("__p.__rs").as("__rs"),
            col("dist"))
      }
    out.select(col("__lid").as(lId), col("__ls").as(lStr),
      col("__rid").as(rId), col("__rs").as(rStr), col("dist"))
  }
}
