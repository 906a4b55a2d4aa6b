package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** 2-D Hilbert-curve index of two normalized BIGINT keys (each in
  * [0, 2^bits)), as a BIGINT — the better-locality twin of the Morton
  * interleave in [[graft.operators.Layout.zorderKey2]]: the Hilbert curve
  * has no Morton "seams" (adjacent curve positions are always grid
  * neighbors), so contiguous key ranges cover tighter rectangles and
  * per-file min/max spans shrink at the same bit budget.
  *
  * Evaluated MSB-first through the standard 4-state orientation machine
  * (state = accumulated swap/invert of the recursive rotation; tables
  * derived from and spec-locked against the classic xy2d algorithm) —
  * two table lookups per bit level. A column-expression formulation of
  * xy2d's mutating rotation would double the expression tree per level
  * (~2^bits nodes); this is one codegen'd loop, the
  * [[DotProduct]]/[[L2Dist2]] treatment.
  *
  * Bits of inputs above `bits` are ignored (callers normalize first). */
case class HilbertKey2(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits > 0 && 2 * bits <= 62, s"2*bits must fit a positive long: $bits")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"hilbert_key2 expects bigint args, got ${left.dataType} / ${right.dataType}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_key2"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Long]
    val y = b.asInstanceOf[Long]
    var state = 0
    var d = 0L
    var i = bits - 1
    while (i >= 0) {
      val q = ((((x >> i) & 1L) << 1) | ((y >> i) & 1L)).toInt
      d = (d << 2) | HilbertKey2.Digit(state * 4 + q)
      state = HilbertKey2.Next(state * 4 + q)
      i -= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val next = ctx.addReferenceObj("hilbertNext", HilbertKey2.Next, "int[]")
    val digit = ctx.addReferenceObj("hilbertDigit", HilbertKey2.Digit, "int[]")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val st = ctx.freshName("state")
      val i = ctx.freshName("i")
      val q = ctx.freshName("q")
      s"""
         |int $st = 0;
         |${ev.value} = 0L;
         |for (int $i = ${bits - 1}; $i >= 0; $i--) {
         |  int $q = (int) (((($a >> $i) & 1L) << 1) | (($b >> $i) & 1L));
         |  ${ev.value} = (${ev.value} << 2) | $digit[$st * 4 + $q];
         |  $st = $next[$st * 4 + $q];
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertKey2 {
  /** State machine over q = (xbit << 1) | ybit. State = (invert << 1) |
    * swap of the accumulated rotation; derived empirically from the
    * reference xy2d and verified exhaustively (Round11Spec). */
  private[graft] val Next: Array[Int] =
    Array(1, 0, 3, 0, 0, 2, 1, 1, 2, 1, 2, 3, 3, 3, 0, 2)
  private[graft] val Digit: Array[Int] =
    Array(0, 1, 3, 2, 0, 3, 1, 2, 2, 3, 1, 0, 2, 1, 3, 0)
}
