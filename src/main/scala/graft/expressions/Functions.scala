package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.udf

/** SQL-surface registration (SURVEY.md §2.11): the custom Catalyst
  * expression and the scalar cleaners become callable from `spark.sql`,
  * mirroring the reference's PL/pgSQL function surface.
  */
object Functions {

  def register(spark: SparkSession): Unit = {
    // native expression → FunctionRegistry (expression-level, codegen'd)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash_min",
      exprs => RollingHashMin(exprs.head,
        exprs.lift(1).map(_.eval().asInstanceOf[Number].intValue).getOrElse(16)),
      "scala_udf")

    // scalar cleaners for SQL parity (clean_title stays a native chain
    // when used via the Column API; the SQL surface wraps it as a UDF)
    spark.udf.register("clean_company_name",
      udf((s: String) => graft.functions.Cleaners.cleanCompanyNameImpl(s)))
  }
}
