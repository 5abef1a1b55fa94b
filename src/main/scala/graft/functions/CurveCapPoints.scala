package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** C13 point cap as a native expression (reference
  * `serialize_compact_limited(120)`, `per_schedule_importer.rs:362`):
  * progressively coarser RDP simplification until the curve fits 120
  * points, uniform subsample as last resort — bit-identical to
  * `graft.curves.Curve.capPoints` (spec-pinned).
  *
  * This caps EVERY stored prediction curve (once per prediction row); the
  * UDF form converted the array through Catalyst encoders per row, while
  * most curves are already under the cap — the native fast path returns
  * the child's ArrayData untouched.
  *
  * Deliberately `deterministic = false` (it is pure): the flag is the
  * CollapseProject barrier that stops prediction_min/max from inlining the
  * whole ladder-coalesce + continuation chain three times per row — same
  * rationale as the UDF it replaces. */
object CurveCapPointsOps {

  private def simplify(xs: Array[Float], ys: Array[Float], eps: Float): (Array[Float], Array[Float]) = {
    val n = xs.length
    if (n <= 2) return (xs, ys)
    val keep = new Array[Boolean](n)
    keep(0) = true; keep(n - 1) = true
    // iterative RDP on y-deviation (explicit stack; mirrors Curve.simplify)
    val stack = scala.collection.mutable.Stack[(Int, Int)]((0, n - 1))
    while (stack.nonEmpty) {
      val (lo, hi) = stack.pop()
      if (hi - lo >= 2) {
        val (xLo, yLo) = (xs(lo), ys(lo))
        val (xHi, yHi) = (xs(hi), ys(hi))
        var best = -1
        var bestErr = 0.0f
        var i = lo + 1
        while (i < hi) {
          val yLine = if (xHi == xLo) yLo
                      else yLo + (yHi - yLo) * ((xs(i) - xLo) / (xHi - xLo))
          val err = math.abs(ys(i) - yLine)
          if (err > bestErr) { bestErr = err; best = i }
          i += 1
        }
        if (bestErr > eps && best >= 0) {
          keep(best) = true
          stack.push((lo, best))
          stack.push((best, hi))
        }
      }
    }
    val m = keep.count(identity)
    val ox = new Array[Float](m); val oy = new Array[Float](m)
    var i = 0; var j = 0
    while (i < n) { if (keep(i)) { ox(j) = xs(i); oy(j) = ys(i); j += 1 }; i += 1 }
    (ox, oy)
  }

  /** Called from generated code. Fast path: curves already under the cap
    * pass through as the child's own ArrayData (no copy). */
  def cap(curve: ArrayData, maxPoints: Int): ArrayData = {
    val n = curve.numElements()
    if (n <= maxPoints) return curve
    var xs = new Array[Float](n)
    var ys = new Array[Float](n)
    var i = 0
    while (i < n) {
      val p = curve.getStruct(i, 2)
      xs(i) = p.getFloat(0); ys(i) = p.getFloat(1)
      i += 1
    }
    val (origXs, origYs) = (xs, ys)
    var eps = 0.001f
    while (xs.length > maxPoints && eps < 1.0f) {
      // each pass re-simplifies the ORIGINAL curve at coarser eps, exactly
      // like Curve.capPoints (simplify is called on `this`, not the result)
      val r = simplify(origXs, origYs, eps)
      xs = r._1; ys = r._2
      eps *= 2.0f
    }
    if (xs.length > maxPoints) {
      // uniform subsample over the ORIGINAL points, keeping endpoints
      val idx = (0 until maxPoints)
        .map(i => (i.toLong * (n - 1) / (maxPoints - 1)).toInt).distinct
      xs = idx.map(origXs).toArray; ys = idx.map(origYs).toArray
    }
    val out = new Array[Any](xs.length)
    i = 0
    while (i < xs.length) { out(i) = InternalRow(xs(i), ys(i)); i += 1 }
    new GenericArrayData(out)
  }
}

case class CurveCapPoints(child: Expression, maxPoints: Int)
    extends UnaryExpression {

  override lazy val deterministic: Boolean = false // pure; collapse barrier

  override def dataType: DataType = child.dataType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _)
      if s.length == 2 && s.fields.forall(_.dataType == FloatType) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"curve must be ARRAY<STRUCT<x FLOAT, y FLOAT>>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(curve: Any): Any =
    CurveCapPointsOps.cap(curve.asInstanceOf[ArrayData], maxPoints)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CurveCapPointsOps.cap($c, $maxPoints);")

  override protected def withNewChildInternal(newChild: Expression): CurveCapPoints =
    copy(child = newChild)

  override def prettyName: String = "curve_cap_points"
}

object CurveCapPoints {
  def apply(curve: Column, maxPoints: Int): Column =
    ColumnBridge.column(CurveCapPoints(ColumnBridge.expression(curve), maxPoints))
}
