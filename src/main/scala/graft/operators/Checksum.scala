package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType, StringType}

/** Order-independent table content checksum: a per-row portable
  * fingerprint folded by SUM, so two tables are compared without ever
  * co-sorting them — the "did the 100 TB copy/migration/backfill
  * preserve every row" check. SUM is commutative, so the digest is
  * partition-order- and engine-independent, computed as one map-side-
  * partial aggregation (no shuffle beyond the group keys).
  *
  * Fingerprint: md5 over a canonical rendering (columns cast to string,
  * nulls encoded as \u0000, joined on \u0001 — so (null) ≠ ("") and
  * ("a","b") ≠ ("ab")), folded to its first 15 hex digits (60 bits) as
  * a number. Sums accumulate in decimal(38,0) — never overflowing below
  * ~10^17 rows — and the published checksum is the sum mod 10^18, a
  * plain BIGINT any engine can carry. Collision odds stay negligible at
  * fleet scale (a forged collision needs a second preimage of md5's
  * 60-bit prefix ACROSS the multiset sum).
  *
  * CONTRACT: the caller picks `valueCols` whose string rendering is
  * engine-portable — integers, strings, dates, decimals. Raw DOUBLE
  * columns are rejected: Double→string formatting (scientific-notation
  * thresholds, trailing digits) differs across engines; cast to an
  * explicit decimal first and the rendering pins down.
  */
object Checksum {

  private val Mod = "1000000000000000000" // 10^18

  def rowFingerprint(cols: Seq[Column]): Column =
    conv(substring(md5(concat_ws("\u0001",
      cols.map(c => coalesce(c.cast(StringType), lit("\u0000"))): _*)),
      1, 15), 16, 10).cast(DecimalType(38, 0))

  private def checked(df: DataFrame, valueCols: Seq[String]): Seq[Column] = {
    require(valueCols.nonEmpty, "checksum needs at least one value column")
    val doubles = valueCols.filter(c =>
      df.schema(c).dataType == org.apache.spark.sql.types.DoubleType ||
        df.schema(c).dataType == org.apache.spark.sql.types.FloatType)
    require(doubles.isEmpty,
      s"float columns ${doubles.mkString(", ")} have engine-specific string " +
        "rendering — cast to decimal first")
    valueCols.map(col)
  }

  /** One checksum row per group: `(groupCols*, n_rows, checksum)`. */
  def grouped(df: DataFrame, groupCols: Seq[String],
              valueCols: Seq[String]): DataFrame =
    df.withColumn("__fp", rowFingerprint(checked(df, valueCols)))
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        pmod(sum(col("__fp")), expr(Mod)).cast(LongType).as("checksum"))

  /** Whole-table digest: one row, `(n_rows, checksum)`. */
  def global(df: DataFrame, valueCols: Seq[String]): DataFrame =
    df.withColumn("__fp", rowFingerprint(checked(df, valueCols)))
      .agg(count(lit(1)).as("n_rows"),
        pmod(sum(col("__fp")), expr(Mod)).cast(LongType).as("checksum"))
}
