package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinkler.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  test("classic reference values (DuckDB-verified)") {
    // every expected value below was read off DuckDB's
    // jaro_winkler_similarity — the oracle the linkage gate compares to
    assert(jw("MARTHA", "MARHTA") == 0.9611111111111111)
    assert(jw("DIXON", "DICKSONX") == 0.8133333333333332)
    assert(jw("JELLYFISH", "SMELLYFISH") == 0.8962962962962964)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("", "abc") == 0.0)
    assert(jw("", "") == 0.0)
    assert(jw("a", "b") == 0.0)
    // boost is gated on jaro > 0.7: common prefix but low jaro stays raw
    assert(jw("abqqqq", "abzzzzzzzzzz") == 0.5)
    // byte-oriented (like DuckDB): the two-byte 'é' counts as two
    assert(jw("héllo", "hello") == 0.8400000000000001)
  }

  test("symmetry and bounds over random pairs") {
    val r = new scala.util.Random(11)
    for (_ <- 1 to 2000) {
      val a = (1 to r.nextInt(12)).map(_ => ('a' + r.nextInt(6)).toChar).mkString
      val b = (1 to r.nextInt(12)).map(_ => ('a' + r.nextInt(6)).toChar).mkString
      val x = jw(a, b)
      assert(x == jw(b, a), s"asymmetric on ($a, $b)")
      assert(x >= 0.0 && x <= 1.0)
      if (a == b && a.nonEmpty) assert(x == 1.0)
    }
  }

  test("Column API, SQL registration, and null propagation") {
    val df = Seq((Option("MARTHA"), Option("MARHTA")),
      (Option("x"), None), (None: Option[String], Option("y")))
      .toDF("a", "b")
    val viaCol = df.select(JaroWinkler.jaro_winkler(col("a"), col("b")).as("s"))
      .collect()
    assert(viaCol(0).getDouble(0) == 0.9611111111111111)
    assert(viaCol(1).isNullAt(0) && viaCol(2).isNullAt(0))
    Functions.register(spark)
    val viaSql = spark.sql(
      "SELECT jaro_winkler('MARTHA', 'MARHTA') AS s").head().getDouble(0)
    assert(viaSql == 0.9611111111111111)
  }
}
