package graft.expressions

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** SQL-surface registration (SURVEY.md §2.11): the custom Catalyst
  * expression and the scalar cleaners become callable from `spark.sql`,
  * mirroring the reference's PL/pgSQL function surface.
  */
object Functions {

  /** The `k` argument must be a foldable integral literal >= 1 — anything
    * else fails ANALYSIS cleanly instead of throwing a raw
    * ClassCastException out of `eval()` at resolution time.
    */
  private def windowArg(e: Expression): Int = {
    val k = e match {
      case lit if lit.foldable && Seq(ByteType, ShortType, IntegerType, LongType)
          .contains(lit.dataType) =>
        lit.eval() match {
          // longValue then range-check: intValue would silently WRAP a
          // Long literal >= 2^32 into a plausible-but-wrong window
          case n: Number if n.longValue >= 1 && n.longValue <= Int.MaxValue =>
            n.longValue.toInt
          case _ => fail(e)
        }
      case _ => fail(e)
    }
    k
  }

  private def fail(e: Expression): Nothing =
    throw new AnalysisException(
      errorClass = "INVALID_PARAMETER_VALUE.INTEGER",
      messageParameters = Map(
        "parameter" -> "`k` (must be a literal >= 1)",
        "functionName" -> "`rolling_hash_min`",
        "invalidValue" -> e.sql))

  /** The one builder table both registration surfaces share: the
    * session-level [[register]] and the `spark.sql.extensions` hook
    * ([[GraftExtensions]]) — so the SQL surface cannot drift between a
    * programmatic session and a spark-submit-configured cluster.
    */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "rolling_hash_min" -> (exprs => RollingHashMin(exprs.head,
      exprs.lift(1).map(windowArg).getOrElse(16))),
    "content_chunk_bounds" -> (exprs => ContentChunkBounds(exprs.head,
      exprs.lift(1).map(windowArg).getOrElse(16),
      exprs.lift(2).map(windowArg).getOrElse(6),
      exprs.lift(3).map(windowArg).getOrElse(32),
      exprs.lift(4).map(windowArg).getOrElse(256))),
    "unicode_nfc"   -> (exprs => UnicodeNormalize(exprs.head, strip = false)),
    "unicode_nfkc"  -> (exprs => UnicodeNormalize(exprs.head, strip = false,
      compat = true)),
    "strip_accents" -> (exprs => UnicodeNormalize(exprs.head, strip = true)),
    "jaro_winkler"  -> (exprs => JaroWinkler(exprs.head, exprs(1))))

  def register(spark: SparkSession): Unit = {
    // native expressions → FunctionRegistry (expression-level, codegen'd)
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }

    // scalar cleaners for SQL parity (clean_title stays a native chain
    // when used via the Column API; the SQL surface wraps it as a UDF)
    spark.udf.register("clean_company_name",
      udf((s: String) => graft.functions.Cleaners.cleanCompanyNameImpl(s)))
  }
}
