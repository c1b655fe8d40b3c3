package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution profiling: equi-width histograms over a numeric column
  * — the "what does this 100 TB column look like" pass behind skew
  * detection, bucket sizing, and data-quality dashboards.
  *
  * One bounded stats row (min/max) is resolved first, then the bucket
  * id is a narrow arithmetic projection and the counts are one
  * partial-agg'd groupBy over at most `buckets` groups — two linear
  * scans, no window, no join. Empty buckets produce no row (join a
  * spine downstream if a dense vector is needed).
  *
  * The bucket arithmetic is `floor(((v - lo) / (hi - lo)) * buckets)`
  * clamped to `buckets - 1` (the max value belongs to the last bucket,
  * not a phantom overflow one) — every step an exactly-rounded IEEE op
  * on values both engines read identically from parquet, so an oracle
  * restating the same parenthesization hash-matches.
  */
object Profile {

  /** Key-skew report: the `k` heaviest join/group keys with their share
    * of all rows and their ratio to the mean key load — the diagnostic
    * behind "will this key melt a task at 100 TB" and the input to a
    * `skewSalts`/AQE-threshold decision. One partial-agg'd count per
    * key, one bounded stats row, a `TakeOrderedAndProject` top-k —
    * never a global sort. Both ratios are single IEEE divisions of
    * exact integers, so an oracle reproduces them bitwise.
    */
  def keySkew(df: DataFrame, keys: Seq[String], k: Int = 10): DataFrame = {
    require(keys.nonEmpty, "keySkew needs at least one key column")
    require(k >= 1, s"k must be >= 1, got $k")
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
    val r = counts.agg(sum(col("n")).as("total"),
      count(lit(1)).as("groups")).head()
    require(!r.isNullAt(0),
      s"no rows to profile for keys ${keys.mkString(", ")}")
    val (total, groups) = (r.getLong(0), r.getLong(1))
    counts
      .withColumn("share", col("n").cast("double") / lit(total.toDouble))
      .withColumn("skew_vs_avg",
        col("n").cast("double") / (lit(total.toDouble) / lit(groups.toDouble)))
      .orderBy(col("n").desc +: keys.map(col(_).asc): _*)
      .limit(k)
  }

  def equiWidthHistogram(df: DataFrame, valueCol: String,
                         buckets: Int = 20): DataFrame = {
    require(buckets >= 1, s"buckets must be positive, got $buckets")
    val r = df.agg(min(col(valueCol)).cast("double").as("lo"),
      max(col(valueCol)).cast("double").as("hi")).head()
    require(!r.isNullAt(0), s"$valueCol has no non-null values to profile")
    val (lo, hi) = (r.getDouble(0), r.getDouble(1))
    val v = col(valueCol).cast("double")
    val bucket =
      if (hi == lo) lit(0)  // degenerate domain: everything in bucket 0
      else least(floor(((v - lit(lo)) / (lit(hi) - lit(lo))) * lit(buckets)),
        lit(buckets - 1)).cast("int")
    df.filter(v.isNotNull)
      .groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n"))
  }
}
