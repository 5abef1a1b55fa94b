package graft.functions

import graft.{GenSampling, SparkSpec}
import graft.analyse.CurvePoint
import graft.curves.Curve
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** The native expression must agree bit-for-bit with the pure Curve.xAtY
  * — checked across generated curves and probabilities, in both the
  * interpreted (eval) and codegen paths. */
class CurveXAtYSpec extends SparkSpec with GenSampling {

  private val curveGen: Gen[Vector[(Float, Float)]] = for {
    n <- Gen.choose(2, 12)
    xs <- Gen.listOfN(n, Gen.choose(-3000f, 3000f))
    ys <- Gen.listOfN(n - 2, Gen.choose(0.001f, 0.999f))
  } yield {
    val sx = xs.distinct.sorted
    val sy = (Seq(0f) ++ ys.take(sx.length - 2).sorted ++ Seq(1f)).take(sx.length)
    sx.zip(sy).toVector
  }

  test("expressions equal pure xAtY/yAtX across generated curves") {
    import spark.implicits._
    forAllSamples(Gen.zip(curveGen, Gen.choose(0f, 1f)), n = 60) {
      case (pts, p) if pts.length >= 2 =>
        val curve = Curve(pts)
        val x = curve.minX + (curve.maxX - curve.minX) * p
        val df = Seq(Tuple1(pts.map(t => CurvePoint(t._1, t._2))))
          .toDF("points")
          .select(CurveFunctions.xAtY(col("points"), lit(p)).as("x"),
            CurveFunctions.yAtX(col("points"), lit(x)).as("y"))
        val r = df.collect().head
        assert(r.getFloat(0) == curve.xAtY(p), s"xAtY mismatch at p=$p for $pts")
        assert(r.getFloat(1) == curve.yAtX(x), s"yAtX mismatch at x=$x for $pts")
      case _ =>
    }
  }

  test("SQL registration and null handling") {
    import spark.implicits._
    CurveFunctions.register(spark)
    val df = Seq(
      (1L, Seq(CurvePoint(0f, 0f), CurvePoint(60f, 0.5f), CurvePoint(120f, 1f))),
      (2L, null)).toDF("id", "points")
    val out = df.selectExpr("id", "curve_x_at_y(points, 0.5f) AS med")
      .orderBy("id").collect()
    assert(out(0).getFloat(1) == 60f)
    assert(out(1).isNullAt(1))
  }

  test("whole-stage codegen actually compiles the expression (no fallback)") {
    // spark.range (not a local Seq, which ConvertToLocalRelation would
    // fold eagerly through the interpreted path)
    val df = spark.range(100)
      .select(array(
        struct(lit(0f).as("x"), lit(0f).as("y")),
        struct((col("id") + 1).cast("float").as("x"), lit(1f).as("y"))).as("points"))
      .select(CurveFunctions.xAtY(col("points"), lit(0.5f)).as("x"))
    // "*(n)" is the WholeStageCodegen marker in the compact plan string —
    // the Project containing our expression must carry it
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [curve_x_at_y"), plan)
    // sum of (i+1)/2 for i in 0..99 = 2525
    assert(df.agg(sum("x")).collect().head.getDouble(0) == 2525.0)
  }
}
