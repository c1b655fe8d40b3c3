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

  test("tableStats: nulls, ndv, min/max per column; approx tracks exact") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, Some("alpha"), 10L), (2L, Some("beta"), 10L),
      (3L, None, 20L), (4L, Some("alpha"), 30L))
      .toDF("id", "name", "v")
    val ex = Profile.tableStats(df, Seq("id", "name", "v"), exact = true)
      .orderBy("col_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))
    assert(ex(0) == (("id", 4L, 0L, 4L, "1", "4")))
    assert(ex(1) == (("name", 4L, 1L, 2L, "alpha", "beta")))
    assert(ex(2) == (("v", 4L, 0L, 3L, "10", "30")))
    // HLL mode: same shape, ndv within its documented error at tiny n
    val ap = Profile.tableStats(df, Seq("id", "name", "v"))
      .orderBy("col_name").collect()
    for ((e, a) <- ex.zip(ap)) {
      assert(a.getString(0) == e._1 && a.getLong(1) == e._2 &&
        a.getLong(2) == e._3)
      assert(math.abs(a.getLong(3) - e._4) <= math.max(1L, e._4 / 10))
    }
  }

  test("keySkew on an empty frame is rejected with a clear message") {
    val df = Seq.empty[(Long, Long)].toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      Profile.keySkew(df, Seq("k"))
    }
    assert(e.getMessage.contains("no rows to profile"))
  }
  test("zScoreOutliers: moments match the textbook formula, outliers counted") {
    // group g: nine 10.0s and one 110.0 -> mean 20, var = E[x^2]-400
    val vals = Seq.fill(9)(10.0) :+ 110.0
    val df = vals.map(("g", _)).toDF("k", "v")
    val out = Profile.zScoreOutliers(df, Seq("k"), "v", z = 2.0).collect()
    assert(out.length == 1)
    val r = out(0)
    val mean = vals.sum / 10.0
    val varp = vals.map(x => x * x).sum / 10.0 - mean * mean
    assert(r.getLong(1) == 10L)
    assert(math.abs(r.getDouble(2) - mean) < 1e-12)
    assert(math.abs(r.getDouble(3) - math.sqrt(varp)) < 1e-9)
    // only 110 lies beyond 2 sigma (|110-20| = 90 > 2*30)
    assert(r.getLong(4) == 1L)
  }

  test("zScoreOutliers keeps the null-key segment in the report") {
    import org.apache.spark.sql.functions._
    val df = Seq((Some("a"), 1.0), (Some("a"), 2.0),
      (None, 5.0), (None, 100.0)).toDF("seg", "v")
    val out = Profile.zScoreOutliers(df, Seq("seg"), "v", z = 1.0)
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    // the null segment is present with both its rows, not silently dropped
    assert(out(None) == 2L)
    assert(out(Some("a")) == 2L)
  }

  test("zScoreOutliers: constant group has zero std and no outliers") {
    val df = Seq(("g", 5.0), ("g", 5.0), ("g", 5.0)).toDF("k", "v")
    val r = Profile.zScoreOutliers(df, Seq("k"), "v").collect()(0)
    assert(r.getDouble(3) == 0.0)
    assert(r.getLong(4) == 0L)
  }
  test("groupQuantilesDisc picks the nearest-rank element exactly") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 100.0),
      ("b", 7.0)).toDF("g", "v")
    val out = Profile.groupQuantilesDisc(df, Seq("g"), "v", Seq(25, 50, 75))
      .orderBy("g").collect()
    // n=5: ranks ceil(1.25)=2, ceil(2.5)=3, ceil(3.75)=4 -> 2.0, 3.0, 4.0
    assert(out(0).getDouble(1) == 2.0 && out(0).getDouble(2) == 3.0 &&
      out(0).getDouble(3) == 4.0)
    // singleton group: every quantile IS the element
    assert(out(1).getDouble(1) == 7.0 && out(1).getDouble(3) == 7.0)
  }

  test("robustScale is outlier-resistant and zero-IQR groups scale to 0") {
    val df = Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0),
      ("a", 4L, 4.0), ("a", 5L, 1e9), // the outlier barely moves median/IQR
      ("c", 6L, 5.0), ("c", 7L, 5.0)).toDF("g", "id", "v")
    val out = Profile.robustScale(df, Seq("g"), "v")
      .orderBy("id").collect().map(_.getDouble(3))
    // group a: p25=2, p50=3, p75=4 -> (v-3)/2
    assert(out.take(4).toSeq == Seq(-1.0, -0.5, 0.0, 0.5))
    assert(out(4) == (1e9 - 3.0) / 2.0)
    // constant group: IQR 0 -> 0.0
    assert(out(5) == 0.0 && out(6) == 0.0)
  }

  test("winsorize clamps into the [p-lo, p-hi] band, nulls stay null") {
    val df = Seq(("a", 1L, Some(-100.0)), ("a", 2L, Some(2.0)),
      ("a", 3L, Some(3.0)), ("a", 4L, Some(4.0)), ("a", 5L, Some(500.0)),
      ("a", 6L, None)).toDF("g", "id", "v")
    val out = Profile.winsorize(df, Seq("g"), "v", loPct = 20, hiPct = 80)
      .orderBy("id").collect()
      .map(r => if (r.isNullAt(3)) None else Some(r.getDouble(3)))
    // n=5 non-null: p20 = rank ceil(1)=1 -> -100.0, p80 = rank 4 -> 4.0
    assert(out.toSeq == Seq(Some(-100.0), Some(2.0), Some(3.0),
      Some(4.0), Some(4.0), None))
  }

  test("rankNormalize maps to [0,1], singleton groups to 0, nulls excluded") {
    val df = Seq(("a", 1L, Some(5.0)), ("a", 2L, Some(1.0)),
      ("a", 3L, Some(9.0)), ("b", 4L, Some(7.0)), ("a", 5L, None))
      .toDF("g", "id", "v")
    val out = Profile.rankNormalize(df, Seq("g"), "v", tieCols = Seq("id"))
      .orderBy("id").collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(out == Map(1L -> 0.5, 2L -> 0.0, 3L -> 1.0, 4L -> 0.0))
    assert(!out.contains(5L)) // null-valued row excluded
  }

  test("minMaxScale maps to [0,1], constant columns to 0, nulls stay null") {
    val df = Seq(
      (1L, Some(10.0), 5.0), (2L, Some(20.0), 5.0),
      (3L, Some(40.0), 5.0), (4L, Option.empty[Double], 5.0))
      .toDF("id", "v", "c")
    val out = Profile.minMaxScale(df, Seq("v", "c")).orderBy("id").collect()
    assert(out(0).getDouble(3) == 0.0)
    assert(out(1).getDouble(3) == (20.0 - 10.0) / 30.0)
    assert(out(2).getDouble(3) == 1.0)
    assert(out(3).isNullAt(3))
    assert(out.take(3).forall(_.getDouble(4) == 0.0)) // constant col
    assert(out(3).getDouble(4) == 0.0)
  }

  test("minMaxScale rejects an all-null column with a clear message") {
    val df = Seq(Option.empty[Double], None).toDF("v")
    val e = intercept[IllegalArgumentException] {
      Profile.minMaxScale(df, Seq("v"))
    }
    assert(e.getMessage.contains("no non-null"))
  }
}
