package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Goldens for parse_location (`dimensions/location.py:36-87`),
  * compute_company_hash (`dimensions/company.py:16-20` +
  * `tests/unit/test_dimensions.py:12-47`) and _parse_last_update
  * (`parser.py:83-106`).
  */
class LocationsHashesSpec extends SparkSpec {

  private def loc(s: String): Seq[(String, String)] =
    evalStr(Locations.parseLocations, s).asInstanceOf[scala.collection.Seq[Row]]
      .map(r => (r.getString(0), r.getString(1))).toSeq

  test("single Vietnamese city, not merged") {
    assert(loc("Hà Nội") == Seq(("Hà Nội", "Vietnam")))
  }
  test("merged province gets (mới) suffix") {
    assert(loc("Hồ Chí Minh") == Seq(("Hồ Chí Minh (mới)", "Vietnam")))
    assert(loc("Đà Nẵng (mới)") == Seq(("Đà Nẵng (mới)", "Vietnam")))
  }
  test("multi-location split on ' & '") {
    assert(loc("Hà Nội & Hồ Chí Minh") ==
      Seq(("Hà Nội", "Vietnam"), ("Hồ Chí Minh (mới)", "Vietnam")))
  }
  test("'nơi khác' parts dropped") {
    assert(loc("Hà Nội & 2 nơi khác") == Seq(("Hà Nội", "Vietnam")))
  }
  test("foreign country whole-string") {
    assert(loc("Nhật Bản") == Seq(("Unknown", "Nhật Bản")))
  }
  test("foreign country as part") {
    assert(loc("Hà Nội & Singapore") ==
      Seq(("Hà Nội", "Vietnam"), ("Unknown", "Singapore")))
  }
  test("null-ish inputs → empty") {
    assert(loc(null) == Seq())
    assert(loc("") == Seq())
    assert(loc("None") == Seq())
    assert(loc("nan") == Seq())
  }
  test("unknown city kept as-is") {
    assert(loc("Some Other Place") == Seq(("Some Other Place", "Vietnam")))
  }

  // compute_company_hash goldens (test_dimensions.py)
  private def hash(s: String): String =
    evalStr(Hashes.companyHash, s).asInstanceOf[String]

  test("company hash deterministic") {
    assert(hash("FPT Software") == hash("FPT Software"))
  }
  test("company hash case-insensitive") {
    assert(hash("FPT Software") == hash("fpt software"))
    assert(hash("FPT Software") == hash("  FPT SOFTWARE  "))
  }
  test("company hash empty/null → md5('unknown')") {
    val unknownMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest("unknown".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(hash("") == unknownMd5)
    assert(hash(null) == unknownMd5)
  }
  test("company hash unicode") {
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("công ty tnhh abc".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(hash("Công Ty TNHH ABC") == expected)
  }

  // _parse_last_update goldens (parser.py:83-106)
  private def lu(s: String): Long =
    evalStr(LastUpdate.lastUpdateSeconds, s).asInstanceOf[Long]

  test("last_update units") {
    assert(lu("Cập nhật 2 tháng trước") == 2L * 30 * 24 * 3600)
    assert(lu("Cập nhật 1 tuần trước") == 7L * 24 * 3600)
    assert(lu("Cập nhật 3 ngày trước") == 3L * 24 * 3600)
    assert(lu("Cập nhật 5 giờ trước") == 5L * 3600)
    assert(lu("Cập nhật 45 phút trước") == 45L * 60)
    assert(lu("Cập nhật 30 trước") == 30L)
  }
  test("last_update null/empty/no-number → 0") {
    assert(lu(null) == 0L)
    assert(lu("") == 0L)
    assert(lu("Cập nhật gần đây") == 0L)
  }

  test("nullifyEmpty maps '' and 'None' to null") {
    assert(evalStr(Hashes.nullifyEmpty, "") == null)
    assert(evalStr(Hashes.nullifyEmpty, "None") == null)
    assert(evalStr(Hashes.nullifyEmpty, "x") == "x")
  }
}
