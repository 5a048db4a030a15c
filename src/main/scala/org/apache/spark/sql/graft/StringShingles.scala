// Lives under org.apache.spark.sql for the same reason as QuantizedDot:
// the Column↔Expression bridge (classic.ExpressionUtils) is private[sql].
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All space-joined `k`-token shingles of a token array in ONE native
  * expression: element `i` of the result is
  * `concat_ws(" ", toks[i], …, toks[i+k-1])`; an array with fewer than
  * `k` tokens yields an empty result.
  *
  * Rationale (optimization round): every gram-construction site
  * previously posexploded the token array and re-assembled windows
  * with `lead(tok, o).over(Window.partitionBy(doc_id).orderBy(pos))` —
  * correct and codegen'd, but the window forces a
  * hashpartitioning(doc_id) EXCHANGE plus a per-doc sort of the whole
  * token stream even though the tokens were just produced per row.
  * (Array higher-order functions would avoid the exchange but run
  * interpreted — the measured ~20× regression that motivated the
  * window shape originally.) This expression is the third option:
  * per-row, whole-stage-codegen'd, no exchange and no lambda
  * interpretation.
  *
  * Semantics match the window formulation exactly: the same strings in
  * the same per-document order (callers explode + distinct or
  * aggregate, so intra-doc order is immaterial anyway), incomplete
  * trailing windows dropped — and match `concat_ws`'s null handling
  * (null elements are skipped; the tokenizer never produces one).
  * A null array yields null.
  */
case class StringShingles(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1, s"shingle width must be >= 1: $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    StringShingles.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      s"""
         |${ev.value} = org.apache.spark.sql.graft.StringShingles.compute($arr, $k);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StringShingles {
  private val Space = UTF8String.fromString(" ")

  /** Shared by the interpreted and generated paths. */
  def compute(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    val m = math.max(0, n - k + 1)
    val out = new Array[UTF8String](m)
    val window = new Array[UTF8String](k)
    var i = 0
    while (i < m) {
      var j = 0
      while (j < k) {
        window(j) = if (arr.isNullAt(i + j)) null else arr.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(Space, window: _*)
      i += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[AnyRef]])
  }

  /** Column-level entry point. */
  def apply(toks: Column, k: Int): Column =
    ExpressionUtils.column(StringShingles(ExpressionUtils.expression(toks), k))
}
