package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Locations
import graft.operators.Keys

/** FactJobLocationBridge builder (M7).
  *
  * Reference: `src/etl/warehouse/facts/bridge.py:23-179`. Three set steps:
  *
  *   1. orphan cleanup (`:42-53`): bridges whose fact vanished are dropped
  *      (left_semi against the fact — null-safe, unlike NOT IN);
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
  */
object Bridge {

  val UnknownSk = -1L

  def buildDay(bridgeExisting: DataFrame, factAll: DataFrame,
               factToday: DataFrame, factYesterday: DataFrame,
               staging: DataFrame, dimJob: DataFrame, dimLocation: DataFrame,
               maxBridgeId: Long): DataFrame = {
    // 1. Orphan cleanup.
    val cleaned = bridgeExisting
      .join(factAll.select("fact_id"), Seq("fact_id"), "left_semi")

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

    // 3. Carry-forward for still-bridgeless facts of today.
    val bridgedSoFar = cleaned.select("fact_id").union(staged.select("fact_id")).distinct()
    val factsNoBridge = factToday
      .join(bridgedSoFar, Seq("fact_id"), "left_anti")
      .select(col("fact_id"), col("job_sk"))
    val yesterdayBridges = factYesterday.select(col("job_sk"), col("fact_id").as("y_fact_id"))
      .join(cleaned.withColumnRenamed("fact_id", "y_fact_id"), Seq("y_fact_id"))
      .select(col("job_sk"), col("location_sk"))
    val carried = factsNoBridge.join(yesterdayBridges, Seq("job_sk"))
      .select(col("fact_id"), col("location_sk"))

    val fresh = staged.unionByName(carried)
      .join(cleaned.select("fact_id", "location_sk"), Seq("fact_id", "location_sk"), "left_anti")
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
