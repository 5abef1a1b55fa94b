package graft.curves

import scala.collection.mutable

/** Group-local curve construction — the analytic heart of the engine.
  * These pure functions run inside Spark Aggregators / flatMapGroups over
  * one (route, variant, stop-pair, time-slot, event-type) group; the
  * distribution across groups is Spark's job (SURVEY.md §2.4 A7/A8).
  */
object CurveBuilder {

  /** Delay threshold: |delay| >= 3000 s is discarded before curve building
    * (reference `src/analyser/specific_curves.rs:262-264,315`). */
  val DelayThreshold = 3000

  /** Delays are rounded to multiples of 12 s with integer division, i.e.
    * truncation toward zero (reference `src/analyser/specific_curves.rs:316-320`). */
  def roundDelay(d: Int): Int = (d / 12) * 12

  /** General per-stop delay curve (reference `generate_delay_curve_data`,
    * `src/analyser/specific_curves.rs:356-369`): >=20 values, make_curve
    * without focus, simplify(0.01), PrecisionType=SemiSpecific(2). */
  def generalDelayCurve(delays: Seq[Float]): Option[CurveData] = {
    if (delays.length < 20) return None
    Curve.makeCurve(delays, None).map { case (c, _) =>
      CurveData(c.simplify(0.01f), graft.model.PrecisionType.SemiSpecific, delays.length)
    }
  }

  /** Stop-pair curve-set build (reference `generate_curves_for_stop_pair`,
    * `src/analyser/specific_curves.rs:371-426`).
    *
    * Input: (start-stop departure delay, end-stop delay) pairs, already
    * thresholded and rounded; caller must have checked `pairs.length > 20`
    * (F9). Steps: sort by start delay; build the initial-delay CDF; compute
    * adaptive markers (doubled at both ends); for each (lower, mid, upper)
    * marker window slice pairs by CDF index range, build a focused curve on
    * the END delays, simplify(0.001), drop curves with span < 13 s;
    * sample_size = total slice sizes / number of curves. */
  def stopPairCurveSet(pairs: Seq[(Float, Float)]): Option[CurveSetData] = {
    // sort by (start, end), not start alone: with 12 s rounding equal
    // start delays are common, and a start-only (stable) sort would leave
    // the end-delay order within a tie equal to the COLLECTION order —
    // which follows shuffle layout. The reference sorts by start only
    // (`specific_curves.rs:372`), so its tie output is input-order-
    // dependent too; the full key costs nothing and makes ours
    // reproducible across partitionings.
    //
    // r12 (guide §1.2 step 2): sort and slice over primitive parallel
    // arrays instead of a Seq of boxed tuples — callers hand this
    // whatever collection the aggregation produced, and a list-typed
    // Seq made the downstream positional slicing O(n²). The sort key
    // is encoded into one Long per pair via the standard IEEE
    // order-preserving bit trick (sign-flip for non-negatives, full
    // complement for negatives, applied to both float components):
    // ascending unsigned-long order == lexicographic
    // (TotalOrdering(start), TotalOrdering(end)) — the exact order
    // `sortBy(identity)` realized. Delays are finite 12 s multiples
    // (never NaN/-0.0), and the total orders agree on those anyway.
    val count = pairs.length
    def sortableBits(f: Float): Long = {
      val b = java.lang.Float.floatToIntBits(f)
      (if (b >= 0) b ^ 0x80000000 else ~b) & 0xFFFFFFFFL
    }
    val keys = new Array[Long](count)
    val ks = new Array[Float](count)
    val vs = new Array[Float](count)
    var i = 0
    pairs.foreach { p =>
      keys(i) = (sortableBits(p._1) << 32) | sortableBits(p._2)
      i += 1
    }
    // unsigned order over the encoded key: flip the top bit and use the
    // JDK's signed primitive sort
    i = 0
    while (i < count) { keys(i) = keys(i) ^ Long.MinValue; i += 1 }
    java.util.Arrays.sort(keys)
    def unsortableBits(u: Long): Float = {
      val b = (u & 0xFFFFFFFFL).toInt
      java.lang.Float.intBitsToFloat(if (b < 0) b ^ 0x80000000 else ~b)
    }
    i = 0
    while (i < count) {
      val u = keys(i) ^ Long.MinValue
      ks(i) = unsortableBits(u >>> 32)
      vs(i) = unsortableBits(u)
      i += 1
    }
    Curve.makeCurve(scala.collection.immutable.ArraySeq.unsafeWrapArray(ks),
        None).flatMap { case (initialCurve, _) =>
      val markers = mutable.ArrayBuffer[Float](initialCurve.minX, initialCurve.minX)
      Curve.recurseMarkers(initialCurve, markers, initialCurve.minX, initialCurve.maxX, count.toFloat)
      markers += initialCurve.maxX
      markers += initialCurve.maxX

      var sampleSize = 0
      val curves = Vector.newBuilder[(Float, Curve)]
      var nCurves = 0
      markers.iterator.sliding(3).withPartial(false).foreach { w =>
        val (lower, mid, upper) = (w(0), w(1), w(2))
        val minIndex = (count * initialCurve.yAtX(lower)).toInt
        val maxIndex = (count * initialCurve.yAtX(upper)).toInt
        val lo = math.max(minIndex, 0)
        val hi = math.min(maxIndex, count)
        val sliceLen = math.max(hi - lo, 0)
        sampleSize += sliceLen
        if (sliceLen > 1) {
          val slice = java.util.Arrays.copyOfRange(vs, lo, hi)
          Curve.makeCurve(scala.collection.immutable.ArraySeq
              .unsafeWrapArray(slice), Some(mid)).foreach { case (c0, _) =>
            val c = c0.simplify(0.001f)
            if (c.maxX >= c.minX + 13.0f) {
              curves += ((mid, c))
              nCurves += 1
            }
          }
        }
      }
      if (nCurves == 0) None
      else Some(CurveSetData(CurveSet(curves.result()), graft.model.PrecisionType.Specific, sampleSize / nCurves))
    }
  }

  /** Default-curve leaf build (reference `src/analyser/default_curves.rs:135-160`):
    * >=10 values per (route_type, section, slot, event), make_curve without
    * focus, simplify(0.001). */
  def defaultCurve(delays: Seq[Float]): Option[CurveData] = {
    if (delays.length < 10) return None
    Curve.makeCurve(delays, None).map { case (c, _) =>
      CurveData(c.simplify(0.001f), graft.model.PrecisionType.General, delays.length)
    }
  }

  /** Walk-time curve synthesis (reference `src/monitor/journey_data.rs:558-594`):
    * distance -> pseudo-normal (cos-sqrt) CDF of walk duration. Speeds
    * 0.8-3.5 m/s, detour factor 1.4-1.8, fixed delays 10-45 s; distances
    * < 20 m get a flat ±12 s curve around the fixed-delay midpoint. */
  def walkCurve(distanceMeters: Float): Curve = {
    if (distanceMeters < 20.0f) {
      val mid = (10.0f + 45.0f) / 2.0f
      Curve(Vector((mid - 12.0f, 0.0f), (mid + 12.0f, 1.0f)))
    } else {
      val minDur = distanceMeters * 1.4f / 3.5f + 10.0f
      val maxDur = distanceMeters * 1.8f / 0.8f + 45.0f
      val n = 21
      val pts = (0 until n).map { i =>
        val p = i.toFloat / (n - 1).toFloat
        // cos-shaped sigmoid in [0,1]: y = (1 - cos(pi * p)) / 2, applied on a
        // sqrt-warped axis to skew mass toward shorter durations
        val x = minDur + (maxDur - minDur) * p
        val warped = math.sqrt(p.toDouble).toFloat
        val y = ((1.0 - math.cos(math.Pi * warped)) / 2.0).toFloat
        (x, y)
      }.toVector
      Curve(pts.updated(0, (pts.head._1, 0.0f)).updated(n - 1, (pts.last._1, 1.0f))).simplify(0.01f)
    }
  }
}
