package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CurveCapPoints, CurveContinuation, CurveXAtY, CurveYAtX, RewriteIntersectSize}

/** Session-extension entry point: activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`.
  * Injects the engine's native SQL functions (`curve_x_at_y` family) and
  * ONE optimizer rule: [[graft.functions.RewriteIntersectSize]], which
  * turns `size(array_intersect(a, b))` into a no-materialization set
  * count — a pure optimization (plans are correct, just slower, without
  * the extension). No SparkStrategy is injected — SURVEY.md §4
  * established the built-in planner covers every reference operator. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RewriteIntersectSize)
    ext.injectFunction((
      new FunctionIdentifier("curve_x_at_y"),
      new ExpressionInfo(classOf[CurveXAtY].getName, "curve_x_at_y"),
      { exprs: Seq[Expression] => CurveXAtY(exprs(0), exprs(1)) }))
    ext.injectFunction((
      new FunctionIdentifier("curve_y_at_x"),
      new ExpressionInfo(classOf[CurveYAtX].getName, "curve_y_at_x"),
      { exprs: Seq[Expression] => CurveYAtX(exprs(0), exprs(1)) }))
    ext.injectFunction((
      new FunctionIdentifier("curve_continuation"),
      new ExpressionInfo(classOf[CurveContinuation].getName, "curve_continuation"),
      { exprs: Seq[Expression] => CurveContinuation(exprs(0), exprs(1)) }))
    ext.injectFunction((
      new FunctionIdentifier("curve_cap_points"),
      new ExpressionInfo(classOf[CurveCapPoints].getName, "curve_cap_points"),
      { exprs: Seq[Expression] =>
        val n = exprs(1).eval(null).asInstanceOf[Int]
        CurveCapPoints(exprs(0), n) }))
  }
}
