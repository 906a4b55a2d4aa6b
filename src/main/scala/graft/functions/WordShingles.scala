package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-grams of a text column in one pass.
  *
  * Semantically identical to the composed form
  * `array_distinct(transform(sequence(...), i -> concat_ws(' ',
  * slice(split(trim(text), ' '), i+1, n))))` — same tokens (single-space
  * split of the space-trimmed text, empties preserved), same join
  * delimiter, same below-n => empty-array rule — but evaluated as a
  * single expression. Spark runs higher-order-function lambdas
  * interpreted, and at millions of documents the per-shingle
  * slice/concat/lambda dispatch dominated the whole MinHash pipeline
  * (measured ~10x this implementation).
  *
  * `distinct = false` keeps EVERY window in text order (one element per
  * token position, duplicates preserved), so `posexplode` over the
  * result yields (position, gram) pairs — the input to positional
  * operators like duplicate-span extraction, where losing repeated
  * windows would lose spans. */
case class WordShingles(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String =
    if (distinct) "word_shingles" else "word_shingle_seq"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"word_shingles expects a string argument, got ${child.dataType}")

  def shinglesOf(s: UTF8String): ArrayData = {
    // trim spaces only (matching Spark's trim), split on single spaces
    // keeping empties (matching split(text, " ") / string_split)
    val tokens = s.trim().toString.split(" ", -1)
    if (tokens.length < n) return new GenericArrayData(Array.empty[Any])
    val out =
      if (distinct) mutable.LinkedHashSet[String]()
      else mutable.ArrayBuffer[String]()
    var i = 0
    val sb = new java.lang.StringBuilder
    while (i <= tokens.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(tokens(i + j))
        j += 1
      }
      out += sb.toString
      i += 1
    }
    new GenericArrayData(out.iterator.map(UTF8String.fromString).toArray[Any])
  }

  override def nullSafeEval(input: Any): Any =
    shinglesOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordShingles", this, classOf[WordShingles].getName)
    nullSafeCodeGen(ctx, ev, in => s"${ev.value} = $ref.shinglesOf($in);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
