package graft.analyse

import graft.SparkSpec
import graft.curves.{Curve, CurveBuilder}
import graft.gtfs.GtfsStatic
import graft.model.{EventType, PrecisionType, TimeSlot}
import graft.predict.Predictor
import org.apache.spark.sql.functions._
import java.sql.{Date, Timestamp}

/** Golden end-to-end parity walk (VERDICT r1 #1): the tiny fixture's records
  * are pushed through the full Spark pipeline (records → projections →
  * curves → ladder), and every produced (precision_type, sample_size,
  * curve point) is compared bit-for-bit against an independent PURE-Scala
  * re-execution of the reference's algorithm, hand-traced from:
  *
  *  - A8  `generate_delay_curve_data` over gap-filled projections with RAW
  *        delays (`specific_curves.rs:356-369`, input built at `:132-141`)
  *  - A7  stop-pair sets over thresholded+rounded pairs (`:309-345`)
  *  - A9  default cascade over RAW records with one arrival-scheduled slot
  *        per record and post-average simplify (`default_curves.rs:
  *        115-160,196-236`)
  *  - J11 the ladder order (`predictor/mod.rs:216-335`)
  *
  * The pure side deliberately reuses ONLY the group-local primitives
  * (CurveBuilder / Curve — themselves pinned against hand-computed values in
  * CurveSpec); all orchestration (grouping, slotting, cascading, ladder) is
  * re-derived here from the reference, independently of DelayAnalysis /
  * Predictor.
  */
class GoldenParitySpec extends SparkSpec {

  private val RouteTypeBus = 3

  /** delays per vehicle i: dep@s1 = 12i, arr/dep@s2 = 12i+24, s3 missing,
    * arr@s4 = 12i+48; all scheduled 08:xx on weekdays -> slot 3. */
  private def d0(i: Int) = 12f * i

  private lazy val schedule = GtfsStatic.read(spark, "fixtures/gtfs_tiny")

  private lazy val records = {
    import spark.implicits._
    val rows = (0 until 40).flatMap { i =>
      val d = 12 * i
      val day = java.time.LocalDate.of(2024, 3, 4).plusDays(7 * (i / 5) + i % 5)
      Seq(
        ("src", "rA", "tA1", Date.valueOf(day), 8 * 3600, 1, "s1", new Timestamp(1000L), None, Some(d)),
        ("src", "rA", "tA1", Date.valueOf(day), 8 * 3600, 2, "s2", new Timestamp(1000L), Some(d + 24), Some(d + 24)),
        ("src", "rA", "tA1", Date.valueOf(day), 8 * 3600, 4, "s4", new Timestamp(1000L), Some(d + 48), None))
    }
    rows.toDF("source", "route_id", "trip_id", "trip_start_date",
      "trip_start_time", "stop_sequence", "stop_id", "time_of_recording",
      "delay_arrival", "delay_departure")
      .join(GtfsStatic.routeVariants(schedule.trips, schedule.stopTimes), Seq("trip_id"))
      .cache()
  }

  private lazy val projected = DelayAnalysis.projectedRecords(records, schedule).cache()
  private lazy val generalDf = DelayAnalysis.generalDelayCurves(projected).cache()
  private lazy val curveSetsDf = DelayAnalysis.stopPairCurveSets(projected).cache()
  private lazy val defaultsDf = DelayAnalysis.defaultCurves(records, schedule, schedule.routes).cache()

  private def pts(rows: scala.collection.Seq[org.apache.spark.sql.Row]): Vector[(Float, Float)] =
    rows.map(r => (r.getFloat(0), r.getFloat(1))).toVector

  /** The gap-filled per-vehicle event table, traced by hand: stop_index ->
    * (arr delay, dep delay) for vehicle i. Stop 0 has no arrival (nothing
    * to fill from); stops 2 and 3 inherit stop 1's values where missing. */
  private def vehicleWalk(i: Int): Map[Int, (Option[Float], Option[Float])] = Map(
    0 -> (None, Some(d0(i))),
    1 -> (Some(d0(i) + 24), Some(d0(i) + 24)),
    2 -> (Some(d0(i) + 24), Some(d0(i) + 24)), // gap-filled from stop 1
    3 -> (Some(d0(i) + 48), Some(d0(i) + 24))) // dep gap-filled

  test("A8 golden: every general curve matches the reference walk exactly") {
    val got = generalDf.collect().map { r =>
      (r.getAs[Int]("stop_index"), r.getAs[Int]("event_type"),
        r.getAs[Int]("time_slot_id")) ->
        (r.getAs[Int]("precision_type"), r.getAs[Int]("sample_size"),
          pts(r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("points")))
    }.toMap

    // reference walk: per (stop, event) the raw projected delays, built for
    // the matched slot AND the Default slot (TIME_SLOTS_WITH_DEFAULT)
    val slots = Seq(TimeSlot.WorkdayLateMorning.id, TimeSlot.Default.id)
    val expectedKeys = for {
      idx <- 0 to 3
      et <- Seq(EventType.Arrival, EventType.Departure)
      if !(idx == 0 && et == EventType.Arrival) // no arrival data at stop 0
      slot <- slots
    } yield (idx, et, slot)
    assert(got.keySet == expectedKeys.toSet)

    expectedKeys.foreach { case key @ (idx, et, _) =>
      val delays = (0 until 40).map { i =>
        val (arr, dep) = (vehicleWalk(i)(idx)._1, vehicleWalk(i)(idx)._2)
        if (et == EventType.Arrival) arr.get else dep.get
      }
      val exp = CurveBuilder.generalDelayCurve(delays).get
      val (p, n, points) = got(key)
      assert(p == PrecisionType.SemiSpecific, s"precision at $key")
      assert(n == exp.sampleSize, s"sample_size at $key")
      assert(points == exp.curve.points, s"points at $key")
    }
  }

  test("A7 golden: every stop-pair curve set matches the reference walk") {
    val got = curveSetsDf.collect().map { r =>
      (r.getAs[Int]("start_stop_index"), r.getAs[Int]("end_stop_index"),
        r.getAs[Int]("event_type"), r.getAs[Int]("time_slot_id")) ->
        (r.getAs[Int]("sample_size"),
          r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("curves")
            .map(fc => (fc.getFloat(0), pts(fc.getAs[scala.collection.Seq[org.apache.spark.sql.Row]](1)))).toVector)
    }.toMap

    val slots = Seq(TimeSlot.WorkdayLateMorning.id, TimeSlot.Default.id)
    var checked = 0
    for {
      start <- 0 to 2
      end <- (start + 1) to 3
      et <- Seq(EventType.Arrival, EventType.Departure)
      slot <- slots
    } {
      // reference pairing: (dep delay at start, et delay at end), |d| < 3000
      // then rounded to 12 s (all fixture delays already are)
      val pairs = (0 until 40).map { i =>
        val sd = vehicleWalk(i)(start)._2.get
        val ed = if (et == EventType.Arrival) vehicleWalk(i)(end)._1.get
                 else vehicleWalk(i)(end)._2.get
        (sd, ed)
      }
      val exp = CurveBuilder.stopPairCurveSet(pairs).get
      val (n, curves) = got((start, end, et, slot))
      assert(n == exp.sampleSize, s"sample_size at ($start,$end,$et,$slot)")
      assert(curves.map(_._1) == exp.curveSet.curves.map(_._1), "foci")
      curves.zip(exp.curveSet.curves).foreach { case ((_, gotPts), (_, expCurve)) =>
        assert(gotPts == expCurve.points, s"curve points at ($start,$end,$et,$slot)")
      }
      checked += 1
    }
    assert(checked == 24 && got.size == 24)
  }

  test("A9 golden: the default cascade matches the reference walk exactly") {
    val got = defaultsDf.collect().map { r =>
      (r.getAs[Int]("route_type"), r.getAs[Int]("route_section"),
        r.getAs[Int]("time_slot_id"), r.getAs[Int]("event_type")) ->
        (r.getAs[Int]("precision_type"), r.getAs[Int]("sample_size"),
          pts(r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("points")))
    }.toMap
    assert(got.size == 11 * 3 * 11 * 2)

    // reference leaves from RAW records (no gap fill): one slot per record
    // (scheduled arrival), sections size=min(5,4/3)=1 -> idx0=Beg, idx1/2=Mid,
    // idx3=End. Observed cells, all slot 3, single variant:
    val slot = TimeSlot.WorkdayLateMorning.id
    val raw = Map( // (section, event) -> delays
      (0, EventType.Departure) -> (0 until 40).map(d0),
      (1, EventType.Arrival) -> (0 until 40).map(d0(_) + 24),
      (1, EventType.Departure) -> (0 until 40).map(d0(_) + 24),
      (2, EventType.Arrival) -> (0 until 40).map(d0(_) + 48))
    val leaves = raw.map { case (k, delays) =>
      k -> CurveBuilder.defaultCurve(delays).get
    }
    // General cells: average of the cell's (single) leaf + simplify(0.001)
    leaves.foreach { case ((sec, et), leaf) =>
      val expCurve = Curve.average(Seq(leaf.curve)).simplify(0.001f)
      val (p, n, points) = got((RouteTypeBus, sec, slot, et))
      assert(p == PrecisionType.General)
      assert(n == leaf.sampleSize)
      assert(points == expCurve.points, s"General points at ($sec,$et)")
    }
    // FallbackGeneral: per (route_type, event) pool average + simplify(0.001);
    // pools average in the engine's canonical (sample_size, points) order
    import scala.math.Ordering.Implicits._
    def canonical(pool: Seq[graft.curves.CurveData]) =
      pool.sortBy(l => (l.sampleSize, l.curve.points.toSeq: scala.collection.Seq[(Float, Float)]))
    Seq(EventType.Arrival, EventType.Departure).foreach { et =>
      val pool = canonical(leaves.collect { case ((_, e), l) if e == et => l }.toSeq)
      val expCurve = Curve.average(pool.map(_.curve)).simplify(0.001f)
      val expN = pool.map(_.sampleSize).sum / pool.size
      // pick a Bus cell with no leaf: section 0 arrival (never observed)
      val cell = if (et == EventType.Arrival) (RouteTypeBus, 0, slot, et)
                 else (RouteTypeBus, 2, slot, et)
      val (p, n, points) = got(cell)
      assert(p == PrecisionType.FallbackGeneral)
      assert(n == expN)
      assert(points == expCurve.points, s"Fallback points at $cell")
    }
    // SuperGeneral: all leaves pre-simplified(0.01), averaged, simplify(0.001)
    // (canonical order keys on the RAW points, pre-simplify applies after)
    val superPool = canonical(leaves.values.toSeq)
    val expSuper = Curve.average(superPool.map(_.curve.simplify(0.01f))).simplify(0.001f)
    val expSuperN = superPool.map(_.sampleSize).sum / superPool.size
    val (p, n, points) = got((0, 0, slot, EventType.Arrival)) // Tramway: unobserved
    assert(p == PrecisionType.SuperGeneral)
    assert(n == expSuperN)
    assert(points == expSuper.points)
  }

  test("realtime golden: work-item predictions equal the continuation walk") {
    import spark.implicits._
    // one basis-change work item: vehicle at stop 1 (seq 2) with dep delay
    // 120 -> predictions for every LATER stop, Specific via the curve sets
    val work = Seq(("tA1", "20240308", "08:00:00", "rA", 2, Some(120), 1700000000L))
      .toDF("trip_id", "trip_start_date", "trip_start_time", "route_id",
        "basis_stop_sequence", "basis_delay", "time_of_recording")
    val stats = graft.analyse.StatisticsIO.Statistics(generalDf, curveSetsDf, defaultsDf)
    val preds = graft.predict.RealtimePredictions.fromWork(work, schedule, stats,
      now = java.sql.Timestamp.valueOf("2024-03-08 09:00:00"))
      .collect().map(r => (r.getAs[Int]("stop_sequence"), r.getAs[Int]("event_type")) -> r).toMap

    // later stops: seq 3 (idx 2) and seq 4 (idx 3), both event types
    assert(preds.keySet == Set((3, EventType.Arrival), (3, EventType.Departure),
      (4, EventType.Arrival), (4, EventType.Departure)))
    // hand walk for (4, Arrival): curve set (start=1, end=3, slot3) — delays
    // at start idx 1 are d+24, end arr d+48 — continuation at 120, capped
    val pairs = (0 until 40).map(i => (d0(i) + 24, d0(i) + 48))
    val set = CurveBuilder.stopPairCurveSet(pairs).get
    val exp = set.curveSet.curveAtXWithContinuation(120f).capPoints(120)
    val r = preds((4, EventType.Arrival))
    assert(r.getAs[Int]("precision_type") == PrecisionType.Specific)
    assert(r.getAs[Int]("sample_size") == set.sampleSize)
    assert(pts(r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("prediction_curve"))
      == exp.points)
    assert(r.getAs[Int]("origin_type") == graft.model.OriginType.Realtime)
  }

  test("J11 golden: ladder rungs reproduce the reference's predict() walk") {
    import spark.implicits._
    val variantA = records.select("route_variant").distinct().collect().head.getLong(0)
    def request(variant: Long, stopIdx: Int, startIdx: Option[Int],
                delay: Option[Int]) =
      Seq(("rA", variant, "tA1", Date.valueOf("2024-03-08"), 8 * 3600,
        stopIdx + 1, stopIdx, 4, "s4", EventType.Arrival,
        Timestamp.valueOf("2024-03-08 08:20:00"), startIdx, delay))
        .toDF("route_id", "route_variant", "trip_id", "trip_start_date",
          "trip_start_time", "stop_sequence", "stop_index", "stop_count",
          "stop_id", "event_type", "event_instant", "start_index", "initial_delay")
    def resolve(req: org.apache.spark.sql.DataFrame) =
      Predictor.resolve(req, generalDf, curveSetsDf, defaultsDf, schedule.routes)
        .collect().head

    // Specific: continuation of the (0,3,slot3,Arr) set at x=120, capped
    val slot = TimeSlot.WorkdayLateMorning.id
    val pairs = (0 until 40).map(i => (d0(i), d0(i) + 48))
    val set = CurveBuilder.stopPairCurveSet(pairs).get
    val expSpecific = set.curveSet.curveAtXWithContinuation(120f).capPoints(120)
    val r1 = resolve(request(variantA, 3, Some(0), Some(120)))
    assert(r1.getAs[Int]("precision_type") == PrecisionType.Specific)
    assert(r1.getAs[Int]("sample_size") == set.sampleSize)
    assert(pts(r1.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("prediction_curve"))
      == expSpecific.points)

    // SemiSpecific (no basis): the stop-3 arrival general curve (Default slot)
    val expSemi = CurveBuilder.generalDelayCurve((0 until 40).map(d0(_) + 48)).get
    val r2 = resolve(request(variantA, 3, None, None))
    assert(r2.getAs[Int]("precision_type") == PrecisionType.SemiSpecific)
    assert(r2.getAs[Int]("sample_size") == expSemi.sampleSize)
    assert(pts(r2.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("prediction_curve"))
      == expSemi.curve.capPoints(120).points)

    // default General (unknown variant, no basis): stop 3 -> End, arrival
    val expLeaf = CurveBuilder.defaultCurve((0 until 40).map(d0(_) + 48)).get
    val expDefault = Curve.average(Seq(expLeaf.curve)).simplify(0.001f).capPoints(120)
    val r3 = resolve(request(999L, 3, None, None))
    assert(r3.getAs[Int]("precision_type") == PrecisionType.General)
    assert(r3.getAs[Int]("sample_size") == expLeaf.sampleSize)
    assert(pts(r3.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("prediction_curve"))
      == expDefault.points)
  }
}
