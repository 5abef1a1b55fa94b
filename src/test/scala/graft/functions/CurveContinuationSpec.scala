package graft.functions

import graft.SparkSpec
import graft.analyse.{CurvePoint, FocusCurve}
import graft.curves.{Curve, CurveSet}
import org.apache.spark.sql.functions._

/** The native curve-set continuation must be bit-identical to the pure
  * `CurveSet.curveAtXWithContinuation` on random sets and on every edge
  * (clamp below/above, exact focus hit, duplicate foci). */
class CurveContinuationSpec extends SparkSpec {

  private def randomSet(seed: Int, nCurves: Int): CurveSet = {
    val rnd = new scala.util.Random(seed)
    val foci = Seq.fill(nCurves)(rnd.nextInt(600).toFloat - 300f).distinct.sorted
    CurveSet(foci.map { f =>
      val n = 2 + rnd.nextInt(6)
      val xs = Seq.fill(n + 2)(f + rnd.nextInt(400) - 200).distinct.sorted
      val ys = Seq.fill(xs.length)(rnd.nextFloat()).sorted
      val pts = xs.zip(ys).toVector
        .updated(0, (xs.head, 0.0f))
      (f, Curve(pts.updated(pts.length - 1, (xs.last, 1.0f)).map(p => (p._1.toFloat, p._2))))
    }.toVector)
  }

  private def viaExpression(cs: CurveSet, x: Float): Vector[(Float, Float)] = {
    import spark.implicits._
    val rows = Seq(Tuple1(cs.curves.map { case (f, c) =>
      FocusCurve(f, c.points.map(p => CurvePoint(p._1, p._2)))
    }))
    rows.toDF("curves")
      .select(CurveContinuation(col("curves"), lit(x)).as("out"))
      .collect().head
      .getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("out")
      .map(r => (r.getFloat(0), r.getFloat(1))).toVector
  }

  test("native continuation == pure CurveSet on random sets and edges") {
    for (seed <- 1 to 8; nCurves <- Seq(1, 2, 4)) {
      val cs = randomSet(seed * 31 + nCurves, nCurves)
      val foci = cs.curves.map(_._1)
      val probes = Seq(
        foci.head - 50f, // clamp below
        foci.last + 50f, // clamp above
        foci.head, foci.last // exact outer hits
      ) ++ foci.drop(1).dropRight(1) ++ // interior exact hits
        (if (foci.length > 1) Seq((foci.head + foci.last) / 2f) else Nil)
      probes.foreach { x =>
        val exp = cs.curveAtXWithContinuation(x).points
        val got = viaExpression(cs, x)
        assert(got == exp, s"seed=$seed n=$nCurves x=$x")
      }
    }
  }

  test("native cap-points == pure Curve.capPoints; identity under the cap") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // 400 strictly-increasing points -> must be capped; 50 -> pass-through
    def mkCurve(n: Int): Curve = {
      val xs = Iterator.iterate(0.0f)(_ + 1f + rnd.nextInt(5)).take(n).toVector
      val ys = Vector.fill(n)(rnd.nextFloat()).sorted
        .updated(0, 0.0f).updated(n - 1, 1.0f)
      Curve(xs.zip(ys))
    }
    Seq(400, 50, 121, 120).foreach { n =>
      val c = mkCurve(n)
      val df = Seq(Tuple1(c.points.map(p => CurvePoint(p._1, p._2)))).toDF("c")
      val got = df.select(CurveCapPoints(col("c"), 120).as("o"))
        .collect().head
        .getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("o")
        .map(r => (r.getFloat(0), r.getFloat(1))).toVector
      assert(got == c.capPoints(120).points, s"n=$n")
      assert(got.length <= 120)
    }
  }

  test("whole-stage codegen path produces the same result as eval") {
    import spark.implicits._
    val cs = randomSet(7, 3)
    val df = (1 to 100).map(i => (i, cs.curves.map { case (f, c) =>
      FocusCurve(f, c.points.map(p => CurvePoint(p._1, p._2)))
    })).toDF("id", "curves")
    val out = df.select(col("id"),
        CurveContinuation(col("curves"), col("id").cast("float") * 4f - 200f).as("c"))
      .collect()
    out.foreach { r =>
      val x = r.getInt(0).toFloat * 4f - 200f
      val exp = cs.curveAtXWithContinuation(x).points
      val got = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("c")
        .map(p => (p.getFloat(0), p.getFloat(1))).toVector
      assert(got == exp)
    }
  }
}
