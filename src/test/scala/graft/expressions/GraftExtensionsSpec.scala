package graft.expressions

import graft.SparkSpec

class GraftExtensionsSpec extends SparkSpec {

  test("spark.sql.extensions entry point registers the native functions") {
    // The suite session is BUILT with
    // spark.sql.extensions=graft.expressions.GraftExtensions (a static
    // conf, honored at first construction — exactly the spark-submit
    // deployment path), so these resolve WITHOUT Functions.register.
    val r = spark.sql(
      "SELECT strip_accents('Hà Nội') AS a, unicode_nfc('x') AS b, " +
        "rolling_hash_min('abcdefghijklmnopqrstuvwxyz', 4) AS c").head()
    assert(r.getString(0) == "Ha Noi")
    assert(r.getString(1) == "x")
    assert(!r.isNullAt(2))
  }

  test("a child session inherits the injected functions") {
    val child = spark.newSession()
    assert(child.sql("SELECT strip_accents('é') AS a").head().getString(0) == "e")
  }

  test("extension and programmatic registration share one builder table") {
    assert(Functions.builders.map(_._1).toSet ==
      Set("rolling_hash_min", "content_chunk_bounds", "unicode_nfc",
        "unicode_nfkc", "strip_accents", "jaro_winkler"))
  }
}
