package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, BinaryExpression, Expression, Size}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `size(array_intersect(a, b))` without materializing the intersection
  * array — the hot inner loop of every similarity-join verification
  * (Jaccard = inter / (n1 + n2 - inter)): ArrayIntersect allocates and
  * fills the distinct-common-elements array, Size then reads only its
  * length. This computes the SET cardinality directly from the two
  * inputs (one hash set, no output array).
  *
  * Installed by [[graft.GraftExtensions]] as an optimizer rule
  * ([[RewriteIntersectSize]]) so every `size(array_intersect(..))` in
  * the battery gets it for free; plans stay correct (just slower)
  * without the extension — the rewrite is a pure optimization. */
object IntersectSizeOps {
  def count(a: ArrayData, b: ArrayData, et: DataType): Int = {
    val seen = new java.util.HashSet[Any](a.numElements() * 2)
    var aHasNull = false
    var i = 0
    while (i < a.numElements()) {
      if (a.isNullAt(i)) aHasNull = true else seen.add(a.get(i, et))
      i += 1
    }
    val matched = new java.util.HashSet[Any](seen.size)
    var cnt = 0
    var nullCounted = false
    i = 0
    while (i < b.numElements()) {
      if (b.isNullAt(i)) {
        if (aHasNull && !nullCounted) { cnt += 1; nullCounted = true }
      } else {
        val v = b.get(i, et)
        if (seen.contains(v) && matched.add(v)) cnt += 1
      }
      i += 1
    }
    cnt
  }
}

case class IntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  private def elementType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(l, _), ArrayType(r, _)) if l == r =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"both sides must be arrays of the same type, got" +
          s" ${l.catalogString} / ${r.catalogString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    IntersectSizeOps.count(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], elementType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val et = ctx.addReferenceObj("elementType", elementType)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.IntersectSizeOps.count($a, $b, $et);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectSize =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "intersect_size"
}

/** Optimizer rule: `Size(ArrayIntersect(a, b))` → `IntersectSize(a, b)`
  * for exact-equality element types (strings/integral — NOT float/double,
  * whose NaN set semantics ArrayIntersect special-cases). Skips the
  * legacy size-of-null mode (legacy returns -1 for null input;
  * IntersectSize returns null, the non-legacy behavior). */
object RewriteIntersectSize extends Rule[LogicalPlan] {
  private def rewritable(t: DataType): Boolean = t match {
    case StringType | LongType | IntegerType | ShortType | ByteType |
         BooleanType | DateType | TimestampType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case s @ Size(ai: ArrayIntersect, legacy) if !legacy =>
        ai.left.dataType match {
          case ArrayType(et, _) if rewritable(et) =>
            IntersectSize(ai.left, ai.right)
          case _ => s
        }
    }
}
