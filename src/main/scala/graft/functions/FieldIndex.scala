package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** Hive `field(v, v1, v2, ...)` — 1-based index of `v` among `v1..vn`,
  * 0 when absent or when `v` is NULL.
  *
  * The reference workload uses it to recode the partition value into an
  * int flag: `field(peculiarity, 'nocp', 'cp') - 1`
  * (reference: examples/src/hive/create_m33_schem_view.hql:12). Spark has
  * no built-in equivalent (`array_position` is the closest); this is a
  * native Catalyst expression with whole-stage codegen so it fuses into
  * the scan-project pipeline like any built-in.
  */
case class FieldIndex(children: Seq[Expression]) extends Expression {

  require(children.length >= 2, "field() requires at least 2 arguments")

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c => c.dataType == StringType || c.dataType == NullType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"field() expects string arguments, got ${children.map(_.dataType).mkString(", ")}")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)
  override def prettyName: String = "field"

  override def eval(input: InternalRow): Any = {
    val target = children.head.eval(input)
    if (target == null) 0
    else {
      var i = 1
      var found = 0
      while (i < children.length && found == 0) {
        val v = children(i).eval(input)
        if (v != null && v.equals(target)) found = i
        i += 1
      }
      found
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val target = evals.head
    val result = ctx.freshName("fieldResult")
    val branches = evals.tail.zipWithIndex
      .map { case (e, idx) =>
        s"""
           |if ($result == 0) {
           |  ${e.code}
           |  if (!${e.isNull} && ${e.value}.equals(${target.value})) {
           |    $result = ${idx + 1};
           |  }
           |}
         """.stripMargin
      }
      .mkString("\n")
    ev.copy(
      code = code"""
        |${target.code}
        |int $result = 0;
        |if (!${target.isNull}) {
        |  $branches
        |}
       """.stripMargin,
      isNull = FalseLiteral,
      value = JavaCode.variable(result, IntegerType))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}
