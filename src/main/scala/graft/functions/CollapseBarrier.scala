package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.DataType

/** Identity expression flagged non-deterministic (it is pure): a
  * CollapseProject / filter-inlining barrier for EXPENSIVE projected
  * expressions that downstream operators reference more than once.
  *
  * The recurring pattern (PERF.md "lessons"): `withColumn("jac",
  * <array_intersect ...>)` followed by `filter($"jac" >= t)` — the
  * optimizer inlines the alias into the Filter predicate AND keeps it in
  * the Project, so the intersection runs twice per row (measured 2× wall
  * on the similarity joins once the bench stopped letting count() prune
  * projections). Wrapping the expensive expression in this barrier keeps
  * it in its own Project; the filter then references the projected
  * column. Same rationale as CurveCapPoints' deterministic=false and the
  * candidate-pair UDF's asNondeterministic, just reusable.
  *
  * Trade-off (inherent to the nondeterministic flag): predicates on the
  * wrapped column won't push past it — which is the point — so never wrap
  * partition/source columns a scan-level filter should prune on. */
case class CollapseBarrier(child: Expression) extends UnaryExpression {

  override lazy val deterministic: Boolean = false // pure; collapse barrier

  override def dataType: DataType = child.dataType

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): CollapseBarrier =
    copy(child = newChild)

  override def prettyName: String = "collapse_barrier"
}

object CollapseBarrier {
  def apply(c: Column): Column =
    ColumnBridge.column(CollapseBarrier(ColumnBridge.expression(c)))
}
