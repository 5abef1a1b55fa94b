package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression for the curve quantile `x_at_y` (C7) — the
  * hot scalar of the prediction/monitor path (median sort W4, quantile
  * markers C15, F5's 5%/95% overlap check run once per prediction row).
  *
  * Semantics are bit-identical to `graft.curves.Curve.xAtY` (linear
  * interpolation of the inverse CDF, clamped to the support, leftmost x on
  * flat segments); unlike the UDF form there is no Row materialization —
  * `doGenCode` walks the unsafe array in place inside whole-stage codegen.
  */
case class CurveXAtY(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = FloatType

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(s: StructType, _)
      if s.length == 2 && s.fields.forall(_.dataType == FloatType) =>
      if (right.dataType == FloatType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"probability must be FLOAT, got ${right.dataType.catalogString}")
    case other => TypeCheckResult.TypeCheckFailure(
      s"curve must be ARRAY<STRUCT<x FLOAT, y FLOAT>>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(curve: Any, prob: Any): Any = {
    val arr = curve.asInstanceOf[ArrayData]
    val p = prob.asInstanceOf[Float]
    val n = arr.numElements()
    val first = arr.getStruct(0, 2)
    val last = arr.getStruct(n - 1, 2)
    if (p <= first.getFloat(1)) first.getFloat(0)
    else if (p >= last.getFloat(1)) last.getFloat(0)
    else {
      var i = 1
      while (i < n && arr.getStruct(i, 2).getFloat(1) < p) i += 1
      val lo = arr.getStruct(i - 1, 2)
      val hi = arr.getStruct(i, 2)
      val (x0, y0) = (lo.getFloat(0), lo.getFloat(1))
      val (x1, y1) = (hi.getFloat(0), hi.getFloat(1))
      if (y1 == y0) x0 else x0 + (x1 - x0) * ((p - y0) / (y1 - y0))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, p) => {
      val row = classOf[InternalRow].getName
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val y0 = ctx.freshName("y0")
      val y1 = ctx.freshName("y1")
      s"""
         |int $n = $c.numElements();
         |$row $lo = $c.getStruct(0, 2);
         |$row $hi = $c.getStruct($n - 1, 2);
         |if ($p <= $lo.getFloat(1)) {
         |  ${ev.value} = $lo.getFloat(0);
         |} else if ($p >= $hi.getFloat(1)) {
         |  ${ev.value} = $hi.getFloat(0);
         |} else {
         |  int $i = 1;
         |  while ($i < $n && $c.getStruct($i, 2).getFloat(1) < $p) $i++;
         |  $lo = $c.getStruct($i - 1, 2);
         |  $hi = $c.getStruct($i, 2);
         |  float $y0 = $lo.getFloat(1);
         |  float $y1 = $hi.getFloat(1);
         |  ${ev.value} = ($y1 == $y0) ? $lo.getFloat(0)
         |    : $lo.getFloat(0) + ($hi.getFloat(0) - $lo.getFloat(0))
         |        * (($p - $y0) / ($y1 - $y0));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CurveXAtY =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "curve_x_at_y"
}

/** CDF evaluation `y_at_x` — the symmetric native expression (used by the
  * F5 quantile-overlap filter and transfer math). Same structure as
  * [[CurveXAtY]]: clamp outside the support, linear interpolation inside. */
case class CurveYAtX(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = FloatType

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(s: StructType, _)
      if s.length == 2 && s.fields.forall(_.dataType == FloatType) =>
      if (right.dataType == FloatType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"x must be FLOAT, got ${right.dataType.catalogString}")
    case other => TypeCheckResult.TypeCheckFailure(
      s"curve must be ARRAY<STRUCT<x FLOAT, y FLOAT>>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(curve: Any, xv: Any): Any = {
    val arr = curve.asInstanceOf[ArrayData]
    val x = xv.asInstanceOf[Float]
    val n = arr.numElements()
    val first = arr.getStruct(0, 2)
    val last = arr.getStruct(n - 1, 2)
    if (x <= first.getFloat(0)) first.getFloat(1)
    else if (x >= last.getFloat(0)) last.getFloat(1)
    else {
      var i = 1
      while (i < n && arr.getStruct(i, 2).getFloat(0) < x) i += 1
      val lo = arr.getStruct(i - 1, 2)
      val hi = arr.getStruct(i, 2)
      val (x0, y0) = (lo.getFloat(0), lo.getFloat(1))
      val (x1, y1) = (hi.getFloat(0), hi.getFloat(1))
      if (x1 == x0) y1 else y0 + (y1 - y0) * ((x - x0) / (x1 - x0))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, x) => {
      val row = classOf[InternalRow].getName
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val x0 = ctx.freshName("x0")
      val x1 = ctx.freshName("x1")
      s"""
         |int $n = $c.numElements();
         |$row $lo = $c.getStruct(0, 2);
         |$row $hi = $c.getStruct($n - 1, 2);
         |if ($x <= $lo.getFloat(0)) {
         |  ${ev.value} = $lo.getFloat(1);
         |} else if ($x >= $hi.getFloat(0)) {
         |  ${ev.value} = $hi.getFloat(1);
         |} else {
         |  int $i = 1;
         |  while ($i < $n && $c.getStruct($i, 2).getFloat(0) < $x) $i++;
         |  $lo = $c.getStruct($i - 1, 2);
         |  $hi = $c.getStruct($i, 2);
         |  float $x0 = $lo.getFloat(0);
         |  float $x1 = $hi.getFloat(0);
         |  ${ev.value} = ($x1 == $x0) ? $hi.getFloat(1)
         |    : $lo.getFloat(1) + ($hi.getFloat(1) - $lo.getFloat(1))
         |        * (($x - $x0) / ($x1 - $x0));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CurveYAtX =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "curve_y_at_x"
}

/** Column builders + SQL registration for the native curve functions. */
object CurveFunctions {

  /** Quantile of a curve column at probability p — codegen'd, no UDF. */
  def xAtY(curve: Column, p: Column): Column =
    ColumnBridge.column(CurveXAtY(
      ColumnBridge.expression(curve), ColumnBridge.expression(p)))

  /** CDF evaluation of a curve column at x — codegen'd, no UDF. */
  def yAtX(curve: Column, x: Column): Column =
    ColumnBridge.column(CurveYAtX(
      ColumnBridge.expression(curve), ColumnBridge.expression(x)))

  /** Make the curve functions callable from SQL (`expr`/`spark.sql`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "curve_x_at_y",
      { exprs: Seq[Expression] => CurveXAtY(exprs(0), exprs(1)) },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "curve_y_at_x",
      { exprs: Seq[Expression] => CurveYAtX(exprs(0), exprs(1)) },
      "built-in")
  }
}
