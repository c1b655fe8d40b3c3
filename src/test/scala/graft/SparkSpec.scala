package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for all specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  import org.apache.spark.sql.Column

  /** Evaluate a Column over one string input; null input allowed. */
  def evalStr(expr: Column => Column, input: String): Any = {
    import spark.implicits._
    val df = Seq(Option(input)).toDF("v")
    val r = df.select(expr(df("v")).as("r")).head()
    if (r.isNullAt(0)) null else r.get(0)
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      // static conf, honored only at FIRST session construction in the
      // JVM — building it into the fixture is what proves the
      // spark-submit deployment hook works (GraftExtensionsSpec)
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-test")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
