// Lives under org.apache.spark.sql because AbstractDataType and the
// Column↔Expression bridge (classic.ExpressionUtils) are private[sql]
// — the standard pattern for third-party native expressions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Exact integer dot product of two `array<bigint>` columns as a
  * native Catalyst expression with whole-stage codegen.
  *
  * Rationale: the built-in formulation
  * `aggregate(zip_with(a, b, _*_), 0L, _+_)` is a higher-order
  * function, which Spark evaluates interpreted (CodegenFallback) with
  * per-element boxing — measured ~4× slower on the pair-scoring hot
  * path of the similarity queries (millions of pairs × 64 dims). This
  * expression compiles to a tight primitive loop inside the generated
  * code, keeping pair scoring inside WholeStageCodegen.
  *
  * Semantics match the HOF version exactly: left-to-right summation
  * over min(len) elements, 64-bit wraparound arithmetic. Array
  * elements are assumed non-null (quantize() output).
  */
case class QuantizedDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object QuantizedDot {
  /** Column-level entry point. */
  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(
      QuantizedDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
