// Lives under org.apache.spark.sql for the same reason as QuantizedDot:
// the Column↔Expression bridge (classic.ExpressionUtils) is private[sql].
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The composable polynomial hash state `[th, tp]` of a token in one
  * native expression: `th = fold(acc·31 + charValue) mod P` over the
  * token's characters and `tp = 31^len(token) mod P`, with
  * `P = 1000000007` (TextOps.HashMod).
  *
  * Rationale (optimization round): the token-hash frame previously
  * computed both folds as interpreted `aggregate(filter(split(tok,
  * "")))` higher-order functions — two lambda-per-character walks with
  * per-element boxing over every token of the corpus (the dominant
  * cost of `tok_build`). This expression runs the identical fold as a
  * primitive loop inside whole-stage codegen.
  *
  * Semantics match the HOF formulation exactly on the tokenizer's
  * domain (`[a-z0-9]+` — single-byte chars whose `ascii()` is the byte
  * value) and, beyond it, on every BMP string: the loop walks UTF-16
  * code units exactly as `split(tok, "")` + `ascii(c)` did.
  * A null token yields null; an empty token yields `[0, 1]` (the fold
  * seeds), as `aggregate` over an empty array does.
  */
case class TokenHashState(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(TokenHashState.compute(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  org.apache.spark.sql.graft.TokenHashState.compute($s));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenHashState {
  val P: Long = 1000000007L

  /** Shared by the interpreted and generated paths — one fold over the
    * string's UTF-16 code units.
    */
  def compute(s: UTF8String): Array[Long] = {
    val str = s.toString
    var th = 0L
    var tp = 1L
    var i = 0
    val n = str.length
    while (i < n) {
      th = (th * 31 + str.charAt(i)) % P
      tp = (tp * 31) % P
      i += 1
    }
    Array(th, tp)
  }

  /** Column-level entry point. */
  def apply(tok: Column): Column =
    ExpressionUtils.column(TokenHashState(ExpressionUtils.expression(tok)))
}
