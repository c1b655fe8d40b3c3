package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Locations
import graft.operators.Keys

/** FactJobLocationBridge builder (M7).
  *
  * Reference: `src/etl/warehouse/facts/bridge.py:23-179`. Three set steps:
  *
  *   1. orphan cleanup (`:42-53`): bridges whose fact vanished are
  *      dropped — restated as a DELTA (see below);
  *   2. staging bridges (`:66-99`): parse each staging row's location
  *      string to location SKs via the DimLocation lookup; a row whose
  *      parse yields nothing (or whose parsed pairs all miss the dim) maps
  *      to the Unknown SK −1 (`:145-179`);
  *   3. bridge carry-forward (`:105-142`): today's facts with no bridge
  *      inherit yesterday's bridges of the same job_sk, re-keyed to
  *      today's fact_id.
  *
  * Dedup on `(fact_id, location_sk)` mirrors the reference's probe-before-
  * insert; bridge ids continue from the current max.
  *
  * SCALE SHAPE (the round-13 bridge-stage profile fix): the naive
  * restatement shuffles FULL HISTORY three times per day — orphan
  * cleanup as `bridge ⋈semi factAll`, the bridged-so-far anti against
  * all bridges, and the carry-forward join against all bridges — which
  * made bridge the worst-growing day-run stage (4.6× at 10× data).
  * Within a day-run the only facts that can vanish are TODAY's
  * replaced build (`factTodayExisting \ factToday` — other days'
  * facts are untouched by construction), so cleanup is an anti-join
  * against that DAY-SIZED orphan delta, broadcast; and every
  * history-sized join partner is first narrowed to the day's fact-id
  * universe by a broadcast semi (`cleanedToday`/`cleanedYesterday`) —
  * the full bridge is only ever SCANNED (narrow, no shuffle), never
  * shuffled, and every shuffle in the plan is day-sized. The
  * broadcast sets are a day's fact ids — the same order as the dim
  * keys the build already broadcasts.
  *
  * The delta form maintains the no-orphan invariant INDUCTIVELY (day 1
  * starts empty; each day drops exactly the replaced facts' bridges).
  * Out-of-band fact deletion (retention applied to the fact table,
  * manual surgery) breaks the induction — run [[cleanOrphans]], the
  * reference's full sweep, as the explicit repair afterwards.
  */
object Bridge {

  val UnknownSk = -1L

  /** The reference's FULL orphan sweep (`bridge.py:42-53`): drop every
    * bridge whose fact no longer exists — a history×history semi join
    * (null-safe, unlike NOT IN). The daily build does not need it (its
    * delta cleanup maintains the invariant inductively); this is the
    * REPAIR operator to run after out-of-band fact deletion.
    */
  def cleanOrphans(bridge: DataFrame, factAll: DataFrame): DataFrame =
    bridge.join(factAll.select("fact_id"), Seq("fact_id"), "left_semi")

  def buildDay(bridgeExisting: DataFrame, factToday: DataFrame,
               factTodayExisting: DataFrame, factYesterday: DataFrame,
               staging: DataFrame, dimJob: DataFrame, dimLocation: DataFrame,
               maxBridgeId: Long): DataFrame = {
    // 1. Orphan cleanup, DELTA form: only today's replaced build can
    //    orphan a bridge, so the sweep is one broadcast anti against
    //    the day-sized vanished-id set — a narrow scan of the bridge,
    //    not a history shuffle.
    val orphanedToday = factTodayExisting.select("fact_id")
      .join(factToday.select("fact_id"), Seq("fact_id"), "left_anti")
    val cleaned = bridgeExisting
      .join(broadcast(orphanedToday), Seq("fact_id"), "left_anti")

    // Day-scoped bridge slices: the ONLY rows later day-sized joins can
    // touch. Broadcast-semi against the day's fact ids keeps the full
    // bridge un-shuffled.
    val cleanedToday = cleaned
      .join(broadcast(factToday.select("fact_id")), Seq("fact_id"),
        "left_semi")
    val cleanedYesterday = cleaned
      .withColumnRenamed("fact_id", "y_fact_id")
      .join(broadcast(factYesterday.select(col("fact_id").as("y_fact_id"))),
        Seq("y_fact_id"), "left_semi")

    // 2. Staging bridges: job_id → job_sk → today's fact_id; location
    //    string → SKs. explode_outer keeps unparsable rows so they can map
    //    to Unknown.
    val jobKeys = broadcast(dimJob.filter(col("is_current"))
      .select(col("job_id"), col("job_sk")))
    val locKeys = broadcast(dimLocation.select(
      col("city"), col("country"), col("location_sk")))
    val parsed = staging
      .join(jobKeys, Seq("job_id"))
      .join(factToday.select(col("job_sk"), col("fact_id")), Seq("job_sk"))
      .select(col("fact_id"),
        explode_outer(Locations.parseLocations(col("location"))).as("loc"))
      .join(locKeys,
        col("loc.city") === col("city") && col("loc.country") === col("country"),
        "left_outer")
    // Rebuild per-fact SK lists so "no resolvable location" → [Unknown]
    // (bridge.py:179). Misses (loc parsed but absent from dim) are dropped
    // like the reference's `if sk:` guard.
    val staged = parsed
      .groupBy(col("fact_id"))
      .agg(collect_set(col("location_sk")).as("sks"))
      .select(col("fact_id"),
        explode(when(size(col("sks")) === 0, array(lit(UnknownSk)))
          .otherwise(col("sks"))).as("location_sk"))

    // 3. Carry-forward for still-bridgeless facts of today. Every join
    //    partner here is the day-sized slice — left rows all carry
    //    today's fact ids, so narrowing the bridge side loses nothing.
    val bridgedSoFar = cleanedToday.select("fact_id")
      .union(staged.select("fact_id")).distinct()
    val factsNoBridge = factToday
      .join(bridgedSoFar, Seq("fact_id"), "left_anti")
      .select(col("fact_id"), col("job_sk"))
    val yesterdayBridges = factYesterday.select(col("job_sk"), col("fact_id").as("y_fact_id"))
      .join(cleanedYesterday, Seq("y_fact_id"))
      .select(col("job_sk"), col("location_sk"))
    val carried = factsNoBridge.join(yesterdayBridges, Seq("job_sk"))
      .select(col("fact_id"), col("location_sk"))

    val fresh = staged.unionByName(carried)
      .join(broadcast(cleanedToday.select("fact_id", "location_sk")),
        Seq("fact_id", "location_sk"), "left_anti")
      .dropDuplicates("fact_id", "location_sk")
    // Distributed minting (Keys.assignSorted): (fact_id, location_sk) is
    // unique after the dropDuplicates above, so sorted per-partition
    // offsets yield the same ids a global window would — without moving
    // the day's bridge volume through a single task.
    val minted = Keys.assignSorted(fresh, Seq("fact_id", "location_sk"), "bridge_id",
        offset = maxBridgeId)
      .select(col("bridge_id"), col("fact_id"), col("location_sk"))
    cleaned.select(col("bridge_id"), col("fact_id"), col("location_sk"))
      .unionByName(minted)
  }
}
