package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** C8 curve-set continuation as a native expression (reference
  * `curve_at_x_with_continuation`, used per prediction row at
  * `src/predictor/mod.rs:324`): interpolate a conditional CDF family at the
  * request's initial delay. Replaces the Scala UDF on the ladder's hot
  * path — the per-row Catalyst↔Scala Row conversion of a nested
  * array<struct<focus, points>> was the last UDF cost per prediction; the
  * expression reads the unsafe arrays in place and the generated code calls
  * one static helper (the standard semi-codegen shape for expressions whose
  * output is itself a nested array).
  *
  * Semantics are bit-identical to `graft.curves.CurveSet
  * .curveAtXWithContinuation` (clamp to outer curves — returned AS-IS,
  * unpinned; between foci: pointwise blend over the sorted distinct union
  * grid with endpoints pinned to 0/1) — CurveContinuationSpec pins this.
  */
object CurveContinuationOps {

  private def yAtX(pts: ArrayData, n: Int, x: Float): Float = {
    val x0 = pts.getStruct(0, 2).getFloat(0)
    val xn = pts.getStruct(n - 1, 2).getFloat(0)
    if (x <= x0) return pts.getStruct(0, 2).getFloat(1)
    if (x >= xn) return pts.getStruct(n - 1, 2).getFloat(1)
    var i = 1
    while (i < n && pts.getStruct(i, 2).getFloat(0) < x) i += 1
    val lo = pts.getStruct(i - 1, 2)
    val hi = pts.getStruct(i, 2)
    val (lx, ly) = (lo.getFloat(0), lo.getFloat(1))
    val (hx, hy) = (hi.getFloat(0), hi.getFloat(1))
    if (hx == lx) hy else ly + (hy - ly) * ((x - lx) / (hx - lx))
  }

  /** Called from generated code; input `curves` is
    * array<struct<focus float, points array<struct<x float, y float>>>>,
    * sorted by focus. */
  def continueSet(curves: ArrayData, x: Float): ArrayData = {
    val m = curves.numElements()
    require(m > 0, "empty curve set")
    def focus(i: Int) = curves.getStruct(i, 2).getFloat(0)
    def points(i: Int) = curves.getStruct(i, 2).getArray(1)
    def copyOf(i: Int): ArrayData = {
      val pts = points(i)
      val n = pts.numElements()
      val out = new Array[Any](n)
      var j = 0
      while (j < n) {
        val p = pts.getStruct(j, 2)
        out(j) = InternalRow(p.getFloat(0), p.getFloat(1))
        j += 1
      }
      new GenericArrayData(out)
    }
    if (x <= focus(0)) return copyOf(0)
    if (x >= focus(m - 1)) return copyOf(m - 1)
    var i = 0
    while (i < m && focus(i) < x) i += 1 // first focus >= x
    val (f0, f1) = (focus(i - 1), focus(i))
    if (f1 == f0) return copyOf(i)
    val w1 = (x - f0) / (f1 - f0)
    val w0 = 1.0f - w1
    val c0 = points(i - 1); val n0 = c0.numElements()
    val c1 = points(i); val n1 = c1.numElements()
    // sorted distinct union grid via merge walk (both sides x-sorted)
    val grid = new Array[Float](n0 + n1)
    var (a, b, g) = (0, 0, 0)
    var last = Float.NaN
    while (a < n0 || b < n1) {
      val xa = if (a < n0) c0.getStruct(a, 2).getFloat(0) else Float.PositiveInfinity
      val xb = if (b < n1) c1.getStruct(b, 2).getFloat(0) else Float.PositiveInfinity
      val nxt = if (xa <= xb) { a += 1; if (xb == xa) b += 1; xa }
                else { b += 1; xb }
      if (g == 0 || nxt != last) { grid(g) = nxt; g += 1; last = nxt }
    }
    val out = new Array[Any](g)
    var j = 0
    while (j < g) {
      val gx = grid(j)
      val y = if (j == 0) 0.0f
              else if (j == g - 1) 1.0f
              else w0 * yAtX(c0, n0, gx) + w1 * yAtX(c1, n1, gx)
      out(j) = InternalRow(gx, y)
      j += 1
    }
    new GenericArrayData(out)
  }
}

case class CurveContinuation(left: Expression, right: Expression)
    extends BinaryExpression {

  private val pointType = StructType(Seq(
    StructField("x", FloatType, nullable = false),
    StructField("y", FloatType, nullable = false)))

  override def dataType: DataType = ArrayType(pointType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(s: StructType, _)
      if s.length == 2 && s.fields.head.dataType == FloatType &&
        (s.fields(1).dataType match {
          case ArrayType(p: StructType, _) =>
            p.length == 2 && p.fields.forall(_.dataType == FloatType)
          case _ => false
        }) =>
      if (right.dataType == FloatType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"x must be FLOAT, got ${right.dataType.catalogString}")
    case other => TypeCheckResult.TypeCheckFailure(
      "curve set must be ARRAY<STRUCT<focus FLOAT, points ARRAY<STRUCT<x FLOAT, y FLOAT>>>>, " +
        s"got ${other.catalogString}")
  }

  override protected def nullSafeEval(curves: Any, x: Any): Any =
    CurveContinuationOps.continueSet(
      curves.asInstanceOf[ArrayData], x.asInstanceOf[Float])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, x) =>
      s"${ev.value} = graft.functions.CurveContinuationOps.continueSet($c, $x);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CurveContinuation =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "curve_continuation"
}

object CurveContinuation {
  /** Continuation of a curve-set column at initial delay x — codegen'd. */
  def apply(curves: Column, x: Column): Column =
    ColumnBridge.column(CurveContinuation(
      ColumnBridge.expression(curves), ColumnBridge.expression(x)))
}
