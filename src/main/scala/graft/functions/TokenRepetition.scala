package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass token-repetition statistics of a text column:
  * `[n_tokens, n_distinct, max_token_freq, n_bigrams, n_distinct_bigrams]`.
  *
  * Semantically identical to the composed array-function form (tokens =
  * single-space split of the space-trimmed text keeping empties; bigrams
  * = adjacent pairs joined by one space) — but evaluated as a single
  * hash-counting pass. The composed form needs a nested
  * `transform(distinct, t -> size(filter(tokens, x = t)))`, which is
  * O(distinct x tokens) per document AND runs interpreted (Spark
  * executes higher-order-function lambdas without codegen) — measured
  * 10+ s for the corpus scan that this expression does in well under a
  * second. Same single-method-call codegen shape as [[WordShingles]].
  */
case class TokenRepetition(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_repetition"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"token_repetition expects a string argument, got ${child.dataType}")

  def statsOf(s: UTF8String): ArrayData = {
    val tokens = s.trim().toString.split(" ", -1)
    val counts = mutable.HashMap.empty[String, Long]
    var maxFreq = 0L
    var i = 0
    while (i < tokens.length) {
      val c = counts.getOrElse(tokens(i), 0L) + 1L
      counts.update(tokens(i), c)
      if (c > maxFreq) maxFreq = c
      i += 1
    }
    val biSeen = mutable.HashSet.empty[String]
    i = 0
    while (i + 1 < tokens.length) {
      biSeen += tokens(i) + " " + tokens(i + 1)
      i += 1
    }
    new GenericArrayData(Array[Any](
      tokens.length.toLong, counts.size.toLong, maxFreq,
      math.max(0, tokens.length - 1).toLong, biSeen.size.toLong))
  }

  override def nullSafeEval(input: Any): Any =
    statsOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenRepetition", this, classOf[TokenRepetition].getName)
    nullSafeCodeGen(ctx, ev, in => s"${ev.value} = $ref.statsOf($in);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
