package graft.expressions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** The exact-decimal margin Σ_j dec28,15(x_j · w_j) of a double array
  * against a LITERAL weight vector, as one compiled loop — the per-row
  * kernel of [[graft.llm.LogReg]]'s training iterations and scoring
  * pass, replacing the interpreted
  * `aggregate(zip_with(x, wLit, (x,w) => (x·w).cast(dec28,15)), 0, +).cast(double)`
  * tree (an expression-tree walk and two boxed Decimal allocations per
  * ELEMENT, ×(dim+1) per row, ×2·iters passes in training).
  *
  * Bit-exact replication of the Column form, step by step:
  *   - x_j · w_j: one exactly-rounded IEEE double multiply (same op);
  *   - cast to decimal(28,15): Spark's Cast(Double→Decimal) goes
  *     through `BigDecimal(double)` = java `BigDecimal.valueOf` (the
  *     double's SHORTEST decimal representation, ≤ 17 significant
  *     digits — never the exact binary expansion) then
  *     `changePrecision(28, 15)` = setScale(15, HALF_UP). Replicated
  *     verbatim; the ≤ 17-digit input can never exceed DECIMAL128's 34
  *     digits, so Scala's MathContext never rounds and valueOf+setScale
  *     IS the whole cast.
  *   - accumulate: the Column fold's `(acc + t).cast(decimal(38,15))`
  *     is NOT an exact scale-15 add — `Add(dec(38,15), dec(28,15))`
  *     hits Spark's decimal precision adjustment (precision 39 > 38,
  *     allowPrecisionLoss) and lands on decimal(38,14), so the RUNNING
  *     sum is rounded HALF_UP to scale 14 after every add (the cast
  *     back to scale 15 then pads an exact zero). Replicated verbatim:
  *     `acc = (acc + t).setScale(14, HALF_UP)` — same fixed ascending
  *     order, bit-identical running values;
  *   - final cast decimal→double: BigDecimal.doubleValue, correctly
  *     rounded half-even — Spark's Decimal.toDouble exactly.
  *
  * Null semantics of the zip_with fold, replicated: null array → null;
  * any null element → null; array length ≠ weight length (zip_with
  * null-padding on either side) → null. OptKernelsSpec pins all of it
  * against the verbatim old tree.
  */
case class Dec15Dot(child: Expression, w: Array[Double])
  extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dec15_dot needs array<double>, got $other")
  }
  override def prettyName: String = "dec15_dot"

  override def nullSafeEval(a: Any): Any =
    Dec15Dot.dot(a.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("dec15w", w, "double[]")
    // boxed: the helper returns null for ragged/null-element inputs
    nullSafeCodeGen(ctx, ev, c => {
      s"""java.lang.Double ${ev.value}Box = graft.expressions.Dec15Dot.dot($c, $wRef);
         |if (${ev.value}Box == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}Box.doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Dec15Dot {
  /** One pass; null (boxed) for ragged lengths or null elements. */
  def dot(x: ArrayData, w: Array[Double]): java.lang.Double = {
    if (x.numElements() != w.length) return null
    var acc = JBigDecimal.ZERO
    var j = 0
    while (j < w.length) {
      if (x.isNullAt(j)) return null
      acc = acc.add(JBigDecimal.valueOf(x.getDouble(j) * w(j))
          .setScale(15, RoundingMode.HALF_UP))
        .setScale(14, RoundingMode.HALF_UP) // Add((38,15),(28,15))→(38,14)
      j += 1
    }
    java.lang.Double.valueOf(acc.doubleValue())
  }

  def dec15_dot(x: Column, w: Array[Double]): Column = {
    val shim = org.apache.spark.sql.GraftColumnShim
    shim.column(Dec15Dot(shim.expression(x), w))
  }
}
