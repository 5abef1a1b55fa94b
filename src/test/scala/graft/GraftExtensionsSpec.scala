package graft

import graft.analyse.CurvePoint

/** The session extension makes curve_x_at_y available in SQL without any
  * manual registration (SparkSpec activates it via spark.sql.extensions). */
class GraftExtensionsSpec extends SparkSpec {
  test("spark.sql.extensions injects curve_x_at_y") {
    import spark.implicits._
    val out = Seq(Tuple1(Seq(CurvePoint(0f, 0f), CurvePoint(100f, 1f))))
      .toDF("points")
      .selectExpr("curve_x_at_y(points, 0.25f) AS q25")
      .collect().head.getFloat(0)
    assert(out == 25f)
  }

  test("curve_continuation and curve_cap_points are SQL-callable") {
    import spark.implicits._
    import graft.analyse.FocusCurve
    val set = Seq(
      FocusCurve(0f, Seq(CurvePoint(0f, 0f), CurvePoint(10f, 1f))),
      FocusCurve(100f, Seq(CurvePoint(100f, 0f), CurvePoint(120f, 1f))))
    val cont = Seq(Tuple1(set)).toDF("cs")
      .selectExpr("curve_continuation(cs, 0.0f) AS c")
      .collect().head.getAs[scala.collection.Seq[org.apache.spark.sql.Row]](0)
    assert(cont.map(r => (r.getFloat(0), r.getFloat(1))) ==
      Seq((0f, 0f), (10f, 1f))) // clamp to the first curve
    val capped = Seq(Tuple1((0 until 300).map(i => CurvePoint(i.toFloat, i / 299f))))
      .toDF("c")
      .selectExpr("curve_cap_points(c, 120) AS o")
      .collect().head.getAs[scala.collection.Seq[org.apache.spark.sql.Row]](0)
    assert(capped.length <= 120 && capped.length >= 2)
  }
}
