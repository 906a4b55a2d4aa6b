package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Exact squared L2 distance of two BIGINT arrays, as a BIGINT — the hot
  * kernel of every exact-integer vector scoring path ([[graft.operators.Similarity]]
  * milli-quantizes to long first). A `zip_with` + `aggregate` lambda pair
  * computes the same value through interpreted higher-order functions
  * (one closure call per element per row — the q282 k-NN-graph build
  * scored 1.8 M pairs × 64 dims per round through it); this is one
  * codegen'd tight loop, the [[DotProduct]] treatment for distances.
  *
  * Overflow contract: caller guarantees Σ(aᵢ−bᵢ)² < 2^63 — for
  * milli-quantized unit-ish embeddings each term is ≤ ~4·10^6, so any
  * dimensionality under ~10^12 is safe. Mismatched lengths or a NULL
  * element yield NULL, never a truncated or zero-filled distance. */
case class L2Dist2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"l2_dist2 expects array<bigint> args, got ${left.dataType} / ${right.dataType}")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "l2_dist2"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getLong(i) - y.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  ${ev.value} = 0L;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true;  // NULL element -> NULL, never silent 0
         |    } else {
         |      long $d = $a.getLong($i) - $b.getLong($i);
         |      ${ev.value} += $d * $d;
         |    }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
