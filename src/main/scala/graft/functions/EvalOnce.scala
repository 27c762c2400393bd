package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.DataType

/** Pass-through wrapper that pins an expensive (but pure) expression to
  * ONE evaluation site by reporting itself non-deterministic.
  *
  * Why (optimization guide §4.4, same mechanism as
  * `udf.asNondeterministic`): when a filter references a projected alias
  * of an expensive expression, predicate pushdown substitutes the
  * expression INTO the pushed predicate, and a predicate referencing
  * both sides of a join is merged into the join condition — where each
  * textual reference is evaluated per row (join conditions get no
  * subexpression elimination). The before-plan of q_dedup_jaccard
  * showed `sortedintersectatleast` THREE times in one
  * BroadcastHashJoin condition: every candidate pair paid the merge
  * scan 3x. Wrapping the aliased expression in EvalOnce keeps the
  * Filter above the Project, so the scan runs once per row.
  *
  * The child must be pure — the wrapper only blocks alias inlining,
  * constant folding and reordering; results are unchanged.
  */
case class EvalOnce(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def foldable: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(
      newChild: Expression): EvalOnce = copy(child = newChild)
}

object EvalOnce {
  /** Column-API form. */
  def eval_once(c: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      EvalOnce(org.apache.spark.sql.graft.ColumnBridge.expression(c)))
}
