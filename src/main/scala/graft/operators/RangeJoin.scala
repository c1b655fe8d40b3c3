package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Binned point-in-interval range join: every `points` row whose axis
  * value lands inside a `intervals` row's `[start, end]` (inclusive both
  * ends), optionally under equality keys — the "event inside maintenance
  * window", "reading during experiment", "trade during halt" pattern.
  *
  * Spark has no range-join optimization: the naive `a.ts BETWEEN b.lo
  * AND b.hi` plan is a broadcast nested loop (or worse, a cartesian)
  * that touches |points|·|intervals| pairs per key. This is the binned
  * form instead: pick a bucket width `w`, map each point to bucket
  * `floor(axis / w)`, explode each interval onto every bucket its span
  * overlaps, and equi-join on (keys, bucket) with an exact BETWEEN
  * post-filter. A matching pair meets in exactly one bucket (the
  * point's), so no dedup pass is needed.
  *
  * Scale shape: one hash shuffle per side on (keys, bucket) — work is
  * |points| + Σ(span/w) interval replicas, linear when interval lengths
  * are bounded by a few buckets. Pick `bucketWidth` near the TYPICAL
  * interval length: much smaller multiplies interval replicas, much
  * larger piles unrelated points into each bucket pair. Both failure
  * modes degrade throughput, never correctness.
  *
  * Degenerate spans (an interval covering the whole axis would explode
  * into millions of replicas) are governed by `maxIntervalBuckets`:
  *  - `oversizeBroadcast = false` (default): any oversize interval
  *    raises a runtime error naming the span — the plan stays pure
  *    equi-join (no nested-loop arm), which keeps the no-cartesian plan
  *    audit true for every caller on this path.
  *  - `oversizeBroadcast = true`: oversize intervals are routed to a
  *    broadcast nested-loop arm and unioned back in. Sound for the
  *    handful-of-giant-windows shape (a global outage window over a
  *    year of points); the arm's cost is |points|·|oversize|, so the
  *    caller is asserting that population is tiny.
  *
  * Axis types: integral, date (day number), or timestamp (epoch micros;
  * NTZ is interpreted in the session time zone — consistent on both
  * sides, so bucketing is unaffected). Point and interval axes may mix
  * timestamp flavors but not families. Null axis values never match:
  * a null-axis point joins nothing, a null-span interval catches
  * nothing, mirroring SQL BETWEEN.
  *
  * CONTRACT: non-key output column names must be disjoint between the
  * two inputs (rename upstream); `end >= start` is not required — an
  * inverted interval simply matches nothing, like SQL BETWEEN.
  */
object RangeJoin {

  private def axis(dt: DataType, c: Column): Column = dt match {
    case TimestampType | TimestampNTZType => unix_micros(c.cast(TimestampType))
    case DateType                         => c.cast(IntegerType).cast(LongType)
    case ByteType | ShortType | IntegerType | LongType => c.cast(LongType)
    case other => throw new IllegalArgumentException(
      s"range join axis must be integral, date, or timestamp — got $other")
  }

  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keys: Seq[String], pointCol: String,
                      startCol: String, endCol: String,
                      bucketWidth: Long,
                      maxIntervalBuckets: Int = 4096,
                      oversizeBroadcast: Boolean = false): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(maxIntervalBuckets > 0, "maxIntervalBuckets must be positive")
    val clash = points.columns.toSet
      .intersect(intervals.columns.toSet) -- keys.toSet
    require(clash.isEmpty,
      s"non-key columns ${clash.mkString(", ")} appear on both sides — rename")
    val reserved = Set("__rb", "__pa", "__sa", "__ea")
      .intersect(points.columns.toSet ++ intervals.columns.toSet)
    require(reserved.isEmpty,
      s"columns ${reserved.mkString(", ")} collide with range-join internals — rename")

    val pAxis = axis(points.schema(pointCol).dataType, col(pointCol))
    val sAxis = axis(intervals.schema(startCol).dataType, col(startCol))
    val eAxis = axis(intervals.schema(endCol).dataType, col(endCol))
    // Buckets in pure long arithmetic: (a - pmod(a, w)) is the greatest
    // multiple of w <= a (floor semantics for negative axes too), and the
    // truncating `div` of an exact multiple is exact over the whole long
    // range — no DOUBLE round-trip, so a large integral axis with a small
    // width can never land in the wrong bucket. (Only axis values within
    // w of Long.MinValue could underflow — unreachable for every axis
    // family `axis()` admits.)
    def floorDiv(named: String): Column =
      expr(s"(`$named` - pmod(`$named`, ${bucketWidth}L)) div ${bucketWidth}L")
    val p = points.withColumn("__pa", pAxis)
      .withColumn("__rb", floorDiv("__pa")).drop("__pa")
    val ivals = intervals.withColumn("__sa", sAxis).withColumn("__ea", eAxis)
    val sb = floorDiv("__sa")
    val eb = floorDiv("__ea")
    val nb = eb - sb + lit(1L)

    // inverted spans (end < start) match nothing under BETWEEN; drop them
    // before exploding — sequence() would otherwise generate a DESCENDING
    // bucket list for them, i.e. unbounded junk replicas
    val forward = sb <= eb
    // The oversize guard lives inside the sequence's end bound — an
    // expression the plan actually consumes — because a guard parked in a
    // dropped side column would be erased by column pruning before it
    // could ever fire. raise_error is NullType; the cast keeps both
    // branches long.
    val boundedEnd =
      if (oversizeBroadcast) eb
      else when(nb > maxIntervalBuckets,
        raise_error(concat(lit(s"range join interval spans more than " +
          s"$maxIntervalBuckets buckets of width $bucketWidth at "),
          col(startCol).cast(StringType))).cast(LongType))
        .otherwise(eb)
    val within =
      if (oversizeBroadcast) ivals.filter(nb <= maxIntervalBuckets && forward)
      else ivals.filter(forward)
    val exploded = within.withColumn("__rb", explode(sequence(sb, boundedEnd)))
      .drop("__sa", "__ea")
    val between = col(pointCol).between(col(startCol), col(endCol))
    val main = p.join(exploded, keys :+ "__rb", "inner")
      .filter(between).drop("__rb")

    if (!oversizeBroadcast) main
    else {
      val oversize = ivals.filter(nb > maxIntervalBuckets).drop("__sa", "__ea")
      val keyEq = keys.map(k => p(k) === oversize(k))
        .foldLeft(lit(true))(_ && _)
      val ov = p.drop("__rb")
        .join(broadcast(oversize), keyEq && between, "inner")
      // drop the duplicated key columns the theta join keeps from the
      // interval side, restoring the usingColumns shape of the main arm
      val ovAligned = keys.foldLeft(ov)((df, k) => df.drop(oversize(k)))
      main.unionByName(ovAligned.select(main.columns.map(col): _*))
    }
  }

  /** Binned interval-overlap join: every `left` interval paired with
    * every `right` interval it overlaps (`lStart ≤ rEnd ∧ rStart ≤
    * lEnd`, all bounds inclusive), optionally under equality keys — the
    * "which maintenance windows hit which experiment runs", "session ×
    * outage", "shift × incident" pattern, again a nested-loop plan in
    * naive Spark.
    *
    * Both sides explode onto the buckets their span covers and
    * equi-join on (keys, bucket). A true pair meets in EVERY common
    * bucket, so the dedup is structural, not a distinct pass: only the
    * meeting in the bucket of `max(lStart, rStart)` is kept — when two
    * intervals overlap, the later start lies inside both spans, so that
    * bucket is always common, and it is unique. An exact overlap
    * post-filter removes same-bucket non-overlaps.
    *
    * Scale shape mirrors [[pointInInterval]]: one hash shuffle per
    * side, Σ(span/w) replicas each, `maxIntervalBuckets` raising on
    * degenerate spans on EITHER side (no broadcast arm here — split
    * giant intervals upstream or route them through a dedicated
    * broadcast join). Inverted spans (end < start) match nothing.
    *
    * CONTRACT: as in [[pointInInterval]] — non-key output columns must
    * be disjoint between the sides; both axes one family (integral /
    * date / timestamp).
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      keys: Seq[String],
                      lStartCol: String, lEndCol: String,
                      rStartCol: String, rEndCol: String,
                      bucketWidth: Long,
                      maxIntervalBuckets: Int = 4096): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(maxIntervalBuckets > 0, "maxIntervalBuckets must be positive")
    val clash = left.columns.toSet
      .intersect(right.columns.toSet) -- keys.toSet
    require(clash.isEmpty,
      s"non-key columns ${clash.mkString(", ")} appear on both sides — rename")
    val reserved = Set("__rb", "__lsb", "__rsb", "__sa", "__ea")
      .intersect(left.columns.toSet ++ right.columns.toSet)
    require(reserved.isEmpty,
      s"columns ${reserved.mkString(", ")} collide with range-join internals — rename")

    def explodeSide(df: DataFrame, startCol: String, endCol: String,
                    startBucketName: String): DataFrame = {
      val sA = axis(df.schema(startCol).dataType, col(startCol))
      val eA = axis(df.schema(endCol).dataType, col(endCol))
      val withAxes = df.withColumn("__sa", sA).withColumn("__ea", eA)
      def floorDiv(named: String): Column =
        expr(s"(`$named` - pmod(`$named`, ${bucketWidth}L)) div ${bucketWidth}L")
      val sb = floorDiv("__sa")
      val eb = floorDiv("__ea")
      val nb = eb - sb + lit(1L)
      // same pruning-proof guard as pointInInterval: the bound lives in
      // the sequence the plan consumes
      val boundedEnd = when(nb > maxIntervalBuckets,
        raise_error(concat(lit(s"interval overlap join: span exceeds " +
          s"$maxIntervalBuckets buckets of width $bucketWidth at "),
          col(startCol).cast(StringType))).cast(LongType))
        .otherwise(eb)
      withAxes.filter(sb <= eb)
        .withColumn(startBucketName, sb)
        .withColumn("__rb", explode(sequence(sb, boundedEnd)))
        .drop("__sa", "__ea")
    }

    val l = explodeSide(left, lStartCol, lEndCol, "__lsb")
    val r = explodeSide(right, rStartCol, rEndCol, "__rsb")
    val overlap = col(lStartCol) <= col(rEndCol) &&
      col(rStartCol) <= col(lEndCol)
    l.join(r, keys :+ "__rb", "inner")
      .filter(col("__rb") === greatest(col("__lsb"), col("__rsb")) && overlap)
      .drop("__rb", "__lsb", "__rsb")
  }
}
