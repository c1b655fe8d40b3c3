package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Incremental maintenance of an algebraic rollup — the pattern that
  * keeps a 100 TB fact's summary table from being recomputed from
  * scratch every load: persist per-key accumulator STATE (count,
  * exact-decimal sums, mins, maxes), fold each new slice in as another
  * state, and derive the published aggregate from state alone. Because
  * every accumulator is algebraic (commutative + associative merge),
  * maintenance cost is O(|delta| + |state|) per load instead of
  * O(|history|), and the merge is a single re-aggregation — no join.
  *
  * Sums are EXACT decimals inside the state (the [[graft.Exact]]
  * convention): double summation is order-dependent, so a state merged
  * in a different slice order would drift from the from-scratch
  * aggregate — decimal sums make `merge(state(A), state(B)) ==
  * state(A ∪ B)` an identity, not an approximation (pinned by
  * IncrementalAggSpec's associativity property). The sum is re-cast to
  * a FIXED decimal(28,2) on every output so state schemas stay stable
  * across merge generations (Spark widens sum-of-decimal by 10 digits
  * per aggregation; unchecked, generation k has a different schema
  * than generation k+1). Overflow past 28,2 fails loudly under ANSI
  * rather than wrapping.
  *
  * AVG is derived (`sum / cnt`) at [[finish]] — never stored — the
  * standard algebraic/holistic split: medians/distincts are NOT
  * mergeable this way and belong to the sketch tier
  * ([[graft.llm.Sketches]]).
  */
object IncrementalAgg {

  /** What to maintain per key. Count is always kept (it is the merge
    * weight for AVG). */
  case class Spec(sumCols: Seq[String] = Nil, minCols: Seq[String] = Nil,
                  maxCols: Seq[String] = Nil, avgOf: Seq[String] = Nil) {
    require(avgOf.forall(sumCols.contains),
      s"avgOf must be a subset of sumCols: $avgOf vs $sumCols")
  }

  private val valT = DecimalType(12, 2)
  private val accT = DecimalType(28, 2)

  /** Accumulator state for one slice: one row per key with
    * `__cnt`, `__sum_<c>`, `__min_<c>`, `__max_<c>`. One partial-agg'd
    * shuffle on the keys. */
  def state(df: DataFrame, keys: Seq[String], spec: Spec): DataFrame = {
    val aggs: Seq[Column] =
      count(lit(1)).as("__cnt") +:
        (spec.sumCols.map(c =>
          sum(col(c).cast(valT)).cast(accT).as(s"__sum_$c") ) ++
          spec.minCols.map(c => min(col(c)).as(s"__min_$c")) ++
          spec.maxCols.map(c => max(col(c)).as(s"__max_$c")))
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge any number of states over the same keys/spec: union + one
    * re-aggregation (sum-of-sums, min-of-mins, …) — accumulators are
    * algebraic, so no key join is needed and slice order is
    * irrelevant. */
  def merge(states: Seq[DataFrame], keys: Seq[String], spec: Spec): DataFrame = {
    require(states.nonEmpty, "merge needs at least one state")
    val all = states.reduce(_ unionByName _)
    val aggs: Seq[Column] =
      sum(col("__cnt")).as("__cnt") +:
        (spec.sumCols.map(c =>
          sum(col(s"__sum_$c")).cast(accT).as(s"__sum_$c")) ++
          spec.minCols.map(c => min(col(s"__min_$c")).as(s"__min_$c")) ++
          spec.maxCols.map(c => max(col(s"__max_$c")).as(s"__max_$c")))
    all.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Fold a CDC VIEW-DELTA changelog
    * ([[Cdc.applyChangesStream]] with `emitRetractions = true`, column
    * `changeCol` ∈ upsert|retract) into rollup state: each upsert
    * weighs +1, each retract −1, so updates and deletes maintain the
    * aggregate EXACTLY without touching history — the classic
    * retractable-view maintenance. Only invertible accumulators
    * qualify: `spec.minCols`/`maxCols` must be empty (a retracted row
    * might BE the minimum, and recovering the runner-up needs history —
    * that is a recompute, not a merge), enforced loudly.
    *
    * Same shape as [[state]] + [[merge]]: one weighted partial-agg over
    * the changelog, one union re-aggregation against the prior state.
    * A key whose rows fully cancel keeps a `cnt = 0` state row (cheap,
    * and dropping it is a `filter` at [[finish]] time if desired).
    */
  def applyChangelog(prior: DataFrame, changelog: DataFrame,
                     keys: Seq[String], spec: Spec,
                     changeCol: String = "_change"): DataFrame = {
    require(spec.minCols.isEmpty && spec.maxCols.isEmpty,
      "min/max are not retractable (a retracted row might BE the " +
        "extremum) — use applyChangelogRebuild, which re-derives them " +
        "from the post-apply table for just the retracted keys")
    val w = when(col(changeCol) === "upsert", lit(1L))
      .when(col(changeCol) === "retract", lit(-1L))
      .otherwise(raise_error(concat(
        lit(s"applyChangelog: unexpected $changeCol value "), col(changeCol))))
    val weighted = changelog.withColumn("__w", w)
    val aggs: Seq[Column] =
      sum(col("__w")).as("__cnt") +:
        spec.sumCols.map(c =>
          sum(col("__w").cast(valT) * col(c).cast(valT)).cast(accT)
            .as(s"__sum_$c"))
    val delta = weighted.groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    merge(Seq(prior, delta), keys, spec)
  }

  /** Changelog fold for specs that DO carry min/max — the fallback
    * [[applyChangelog]]'s guard points at, narrowed to the keys that
    * actually need history. The invertible slice (count, sums) folds
    * algebraically exactly as in [[applyChangelog]]. Min/max — which a
    * retraction can invalidate (the retracted row may BE the extremum,
    * and the runner-up is not in state) — are rebuilt ONLY for keys the
    * changelog retracted from, by scanning `current` (the post-apply
    * table, e.g. [[Cdc.applyChanges]]' output) semi-join-pruned to that
    * key set; upsert-only keys keep the cheap algebraic
    * min-of-mins/max-of-maxes merge.
    *
    * Cost: O(|changelog| + |state|) plus one pruned scan of `current`
    * for the retracted keys — O(rows under retracted keys), not
    * O(corpus). A key whose rows fully cancel has no `current` rows and
    * publishes null min/max with `cnt = 0`.
    */
  def applyChangelogRebuild(prior: DataFrame, changelog: DataFrame,
                            current: DataFrame, keys: Seq[String], spec: Spec,
                            changeCol: String = "_change"): DataFrame = {
    require(spec.minCols.nonEmpty || spec.maxCols.nonEmpty,
      "spec has no min/max — use applyChangelog (no rebuild scan needed)")
    val kcols = keys.map(col)
    val mmNames = spec.minCols.map(c => s"__min_$c") ++
      spec.maxCols.map(c => s"__max_$c")
    val folded = applyChangelog(prior.drop(mmNames: _*), changelog, keys,
      spec.copy(minCols = Nil, maxCols = Nil), changeCol)
    def aggBy(df: DataFrame, aggs: Seq[Column]): DataFrame =
      df.groupBy(kcols: _*).agg(aggs.head, aggs.tail: _*)
    // raw rows -> min/max state
    def mmOfRows(df: DataFrame): DataFrame = aggBy(df,
      spec.minCols.map(c => min(col(c)).as(s"__min_$c")) ++
        spec.maxCols.map(c => max(col(c)).as(s"__max_$c")))
    // states -> merged min/max state (min-of-mins / max-of-maxes)
    def mmOfStates(df: DataFrame): DataFrame = aggBy(df,
      spec.minCols.map(c => min(col(s"__min_$c")).as(s"__min_$c")) ++
        spec.maxCols.map(c => max(col(s"__max_$c")).as(s"__max_$c")))
    val retractKeys = changelog.filter(col(changeCol) === "retract")
      .select(kcols: _*).distinct()
    val mmPrior = prior.select(kcols ++ mmNames.map(col): _*)
    val mmUpserts = mmOfRows(changelog.filter(col(changeCol) === "upsert"))
    val mmSafe = mmOfStates(mmPrior.unionByName(mmUpserts))
      .join(retractKeys, keys, "left_anti")
    val mmRebuilt = mmOfRows(current.join(retractKeys, keys, "left_semi"))
    folded.join(mmSafe.unionByName(mmRebuilt), keys, "left")
  }

  /** Publish the aggregate from state: `cnt`, `sum_<c>` (double),
    * `min_<c>`/`max_<c>`, and `avg_<c>` (exact sum / cnt, in doubles)
    * for each `avgOf` column. Narrow projection — no shuffle. */
  def finish(state: DataFrame, keys: Seq[String], spec: Spec): DataFrame = {
    val out: Seq[Column] =
      keys.map(col) ++
        (col("__cnt").as("cnt") +:
          (spec.sumCols.map(c =>
            col(s"__sum_$c").cast(DoubleType).as(s"sum_$c")) ++
            spec.minCols.map(c => col(s"__min_$c").as(s"min_$c")) ++
            spec.maxCols.map(c => col(s"__max_$c").as(s"max_$c")) ++
            // Exact.davg convention: double(exact sum) / count — one
            // correctly-rounded IEEE division, restatable in any engine.
            // A fully-retracted key (cnt = 0, changelog path) has no
            // mean — null, not an ANSI divide-by-zero
            spec.avgOf.map(c =>
              when(col("__cnt") === 0L, lit(null).cast(DoubleType))
                .otherwise(col(s"__sum_$c").cast(DoubleType) / col("__cnt"))
                .as(s"avg_$c"))))
    state.select(out: _*)
  }
}
