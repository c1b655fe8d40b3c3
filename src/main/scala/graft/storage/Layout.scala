package graft.storage

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Morton (z-order) interleaving and a
  * z-ordered parquet writer.
  *
  * Why: min/max zone skipping on a sorted layout only prunes on the
  * leading sort column — a scan filtered on the SECOND column reads
  * every file. Interleaving the bits of several columns into one sort
  * key makes file ranges cover compact hyper-rectangles, so predicates
  * on ANY interleaved column prune most files. This is the standard
  * z-order optimization (as in Delta/Iceberg OPTIMIZE ZORDER BY),
  * expressed with plain codegen-friendly bit arithmetic — no UDF, no
  * shuffle beyond the one range partition the write needs anyway.
  *
  * Two layers:
  *  - [[interleaveBits]]: the pure bit-interleave expression over
  *    already-normalized cell coordinates in `[0, 2^bits)` — column i
  *    contributes bit b to output position `b * n + i`.
  *  - [[writeZOrdered]]: rank-normalizes each layout column onto
  *    `2^bits` cells via approx-quantile boundaries (rank, not
  *    equal-width, so skewed columns still spread across cells),
  *    interleaves, range-partitions on the z-key and sorts within
  *    partitions before writing. Boundary computation is one
  *    `approxQuantile` pass (driver-side result is `cols × 2^bits`
  *    doubles — tiny); the per-row cell lookup is a branch-free
  *    fold over the broadcast boundary array.
  */
object Layout {

  /** Interleave the low `bits` bits of `cols` (values must already lie
    * in `[0, 2^bits)`; use [[cellOf]] or `pmod` to normalize). 2–4
    * columns, `bits * cols.size <= 62` so the key fits a positive long.
    */
  def interleaveBits(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 2 && n <= 4, s"interleave wants 2-4 columns, got $n")
    require(bits >= 1 && bits * n <= 62, s"bits=$bits over $n columns overflows")
    cols.zipWithIndex.flatMap { case (c, i) =>
      (0 until bits).map { b =>
        shiftleft(shiftright(c.cast("long"), b).bitwiseAND(lit(1L)), b * n + i)
      }
    }.reduce(_.bitwiseOR(_))
  }

  /** Map a numeric column onto `[0, boundaries.length]` by counting the
    * rank boundaries at or below it — the quantile-bucket coordinate
    * for [[interleaveBits]]. Nulls land in cell 0.
    */
  def cellOf(c: Column, boundaries: Array[Double]): Column =
    aggregate(typedLit(boundaries), lit(0),
      (acc, b) => acc + when(c.isNotNull && c.cast("double") >= b, 1).otherwise(0))

  /** Per-column rank boundaries: `2^bits - 1` approx-quantile cuts. */
  def rankBoundaries(df: DataFrame, column: String, bits: Int,
                     relativeError: Double = 0.001): Array[Double] = {
    val cells = 1 << bits
    val qs = (1 until cells).map(_.toDouble / cells).toArray
    df.stat.approxQuantile(column, qs, relativeError)
  }

  /** Z-order key over raw (unnormalized) numeric columns. */
  def zKey(df: DataFrame, zCols: Seq[String], bits: Int): Column =
    interleaveBits(zCols.map(c => cellOf(col(c), rankBoundaries(df, c, bits))), bits)

  /** Write `df` as `numFiles` parquet files clustered by the z-order of
    * `zCols`: range-partition on the z-key (so files tile the key space)
    * and sort within each partition (so row-group min/max stay tight).
    * The key column is internal — dropped before the write, which is a
    * projection and keeps the established order.
    */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
                    bits: Int = 8, numFiles: Int = 64): Unit =
    df.withColumn("__z", zKey(df, zCols, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
