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
}
