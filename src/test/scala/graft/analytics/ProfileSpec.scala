package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("equi-width histogram: edges, clamp, and null exclusion") {
    val df = Seq(Some(0.0), Some(2.5), Some(5.0), Some(9.99), Some(10.0), None)
      .toDF("v")
    val h = Profile.equiWidthHistogram(df, "v", buckets = 4)
      .orderBy("bucket").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // domain [0,10], width 2.5: 0→b0, 2.5→b1, 5→b2, 9.99→b3, 10→clamped b3
    assert(h == Map(0 -> 1L, 1 -> 1L, 2 -> 1L, 3 -> 2L))
  }

  test("degenerate single-value domain lands everything in bucket 0") {
    val df = Seq(7.0, 7.0, 7.0).toDF("v")
    val h = Profile.equiWidthHistogram(df, "v", buckets = 10).collect()
    assert(h.length == 1 && h.head.getInt(0) == 0 && h.head.getLong(1) == 3L)
  }

  test("all-null column is rejected with a clear message") {
    val df = Seq(Option.empty[java.lang.Double], None).toDF("v")
    val e = intercept[IllegalArgumentException] {
      Profile.equiWidthHistogram(df, "v")
    }
    assert(e.getMessage.contains("no non-null"))
  }

  test("keySkew on an empty frame is rejected with a clear message") {
    val df = Seq.empty[(Long, Long)].toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      Profile.keySkew(df, Seq("k"))
    }
    assert(e.getMessage.contains("no rows to profile"))
  }
}
