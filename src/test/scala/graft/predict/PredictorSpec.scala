package graft.predict

import graft.SparkSpec
import graft.analyse.DelayAnalysis
import graft.gtfs.GtfsStatic
import graft.model.{EventType, PrecisionType}
import org.apache.spark.sql.functions._
import java.sql.{Date, Timestamp}

/** Ladder resolution over curves built from the same synthetic records as
  * DelayAnalysisSpec (40 runs of tA1, delays 12i at stop 1, +24 at stop 2,
  * +48 at stop 4). */
class PredictorSpec extends SparkSpec {

  private lazy val schedule = GtfsStatic.read(spark, "fixtures/gtfs_tiny")

  private lazy val records = {
    import spark.implicits._
    val rows = (0 until 40).flatMap { i =>
      val d = 12 * (i % 40)
      val day = java.time.LocalDate.of(2024, 3, 4).plusDays(7 * (i / 5) + i % 5)
      Seq(
        ("src", "rA", "tA1", Date.valueOf(day), 8 * 3600, 1, "s1", new Timestamp(1000L), None, Some(d)),
        ("src", "rA", "tA1", Date.valueOf(day), 8 * 3600, 2, "s2", new Timestamp(1000L), Some(d + 24), Some(d + 24)),
        ("src", "rA", "tA1", Date.valueOf(day), 8 * 3600, 4, "s4", new Timestamp(1000L), Some(d + 48), None))
    }
    val df = rows.toDF("source", "route_id", "trip_id", "trip_start_date",
      "trip_start_time", "stop_sequence", "stop_id", "time_of_recording",
      "delay_arrival", "delay_departure")
    df.join(GtfsStatic.routeVariants(schedule.trips, schedule.stopTimes), Seq("trip_id")).cache()
  }

  private lazy val projected = DelayAnalysis.projectedRecords(records, schedule).cache()
  private lazy val general = DelayAnalysis.generalDelayCurves(projected).cache()
  private lazy val curveSets = DelayAnalysis.stopPairCurveSets(projected).cache()
  private lazy val defaults = DelayAnalysis.defaultCurves(records, schedule, schedule.routes).cache()

  private lazy val variantA = records.select("route_variant").distinct()
    .collect().head.getLong(0)

  /** One request row; event_instant 2024-03-08 (Fri) 08:20 -> slot 3. */
  private def request(routeId: String, variant: Long, stopIdx: Int,
                      startIdx: Option[Int], initialDelay: Option[Int],
                      instant: String = "2024-03-08 08:20:00",
                      eventType: Int = EventType.Arrival) = {
    import spark.implicits._
    Seq((routeId, variant, "tA1", Date.valueOf("2024-03-08"), 8 * 3600,
      stopIdx + 1, stopIdx, 4, "s4", eventType,
      Timestamp.valueOf(instant), startIdx, initialDelay))
      .toDF("route_id", "route_variant", "trip_id", "trip_start_date",
        "trip_start_time", "stop_sequence", "stop_index", "stop_count",
        "stop_id", "event_type", "event_instant", "start_index", "initial_delay")
  }

  private def resolve(req: org.apache.spark.sql.DataFrame) =
    Predictor.resolve(req, general, curveSets, defaults, schedule.routes)
      .collect().head

  test("Specific: slot-exact curve-set hit with a basis") {
    val r = resolve(request("rA", variantA, 3, Some(0), Some(120)))
    assert(r.getAs[Int]("precision_type") == PrecisionType.Specific)
    val pts = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("prediction_curve")
    assert(pts.nonEmpty)
    // end delay distribution near initial+48: support must contain it
    assert(pts.head.getFloat(0) <= 168f && pts.last.getFloat(0) >= 168f)
    assert(r.getAs[Timestamp]("prediction_min").before(r.getAs[Timestamp]("prediction_max")))
  }

  test("FallbackSpecific: DEFAULT-slot retry when the slot has no curve set") {
    // Sunday 08:20 -> slot 9, which has no curves (all data is weekday)
    val r = resolve(request("rA", variantA, 3, Some(0), Some(120),
      instant = "2024-03-10 08:20:00"))
    assert(r.getAs[Int]("precision_type") == PrecisionType.FallbackSpecific)
  }

  test("SemiSpecific: no basis -> per-stop general curve") {
    val r = resolve(request("rA", variantA, 1, None, None))
    assert(r.getAs[Int]("precision_type") == PrecisionType.SemiSpecific)
    assert(r.getAs[Int]("sample_size") == 40)
  }

  test("default path: unknown variant falls to the default-curve table") {
    val r = resolve(request("rA", variant = 999L, stopIdx = 3, None, None))
    assert(Set(PrecisionType.General, PrecisionType.FallbackGeneral)
      .contains(r.getAs[Int]("precision_type")))
  }

  test("basis + curve-set miss skips SemiSpecific and lands on defaults") {
    // basis anchored at a stop with no curve sets: the (99, 3) lookup misses
    // in every slot, while the per-stop general curve for stop 3 DOES exist
    // — the reference bails to the default path when a basis is present and
    // the curve-set lookup fails (predictor/mod.rs:285-316), never
    // SemiSpecific (that is reserved for basis-less requests)
    val r = resolve(request("rA", variantA, 3, Some(99), Some(120)))
    assert(Set(PrecisionType.General, PrecisionType.FallbackGeneral)
      .contains(r.getAs[Int]("precision_type")))
  }

  test("basis without initial delay returns the whole curve set") {
    // reference predictor/mod.rs:318-321: PredictionResult::CurveSetData
    val r = resolve(request("rA", variantA, 3, Some(0), None))
    assert(r.getAs[Int]("precision_type") == PrecisionType.Specific)
    assert(r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("prediction_curve_set").nonEmpty)
    assert(r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("prediction_curve") == null)
  }

  test("point lookup matches the set-oriented ladder on every rung") {
    val pp = Predictor.pointLookup(general, curveSets, defaults, schedule.routes,
      routeId = Some("rA"))
    val at = java.time.LocalDateTime.of(2024, 3, 8, 8, 20)
    def pointsOf(r: org.apache.spark.sql.Row) =
      r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("prediction_curve")
        .map(p => (p.getFloat(0), p.getFloat(1))).toVector

    // Specific with delay
    val s1 = pp.predict("rA", variantA, 3, 4, Some(0), Some(120), EventType.Arrival, at).get
    val r1 = resolve(request("rA", variantA, 3, Some(0), Some(120)))
    assert(s1.precisionType == r1.getAs[Int]("precision_type"))
    assert(s1.sampleSize == r1.getAs[Int]("sample_size"))
    assert(s1.curve.get.points == pointsOf(r1))

    // basis without delay: whole curve set
    val s2 = pp.predict("rA", variantA, 3, 4, Some(0), None, EventType.Arrival, at).get
    val r2 = resolve(request("rA", variantA, 3, Some(0), None))
    assert(s2.curveSet.nonEmpty && s2.curve.isEmpty)
    assert(s2.precisionType == r2.getAs[Int]("precision_type"))
    assert(s2.curveSet.get.curves.length ==
      r2.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("prediction_curve_set").length)

    // SemiSpecific (no basis)
    val s3 = pp.predict("rA", variantA, 1, 4, None, None, EventType.Arrival, at).get
    val r3 = resolve(request("rA", variantA, 1, None, None))
    assert(s3.precisionType == PrecisionType.SemiSpecific)
    assert(s3.sampleSize == r3.getAs[Int]("sample_size"))
    assert(s3.curve.get.points == pointsOf(r3))

    // default path (unknown variant)
    val s4 = pp.predict("rA", 999L, 3, 4, None, None, EventType.Arrival, at).get
    val r4 = resolve(request("rA", 999L, 3, None, None))
    assert(s4.precisionType == r4.getAs[Int]("precision_type"))
    assert(s4.sampleSize == r4.getAs[Int]("sample_size"))
    assert(s4.curve.get.points == pointsOf(r4))

    // basis + set miss -> defaults, like the set-oriented ladder
    val s5 = pp.predict("rA", variantA, 3, 4, Some(99), Some(120), EventType.Arrival, at).get
    val r5 = resolve(request("rA", variantA, 3, Some(99), Some(120)))
    assert(s5.precisionType == r5.getAs[Int]("precision_type"))
    assert(s5.curve.get.points == pointsOf(r5))
  }

  test("set-oriented: a batch of mixed requests resolves in one pass") {
    val reqs = request("rA", variantA, 3, Some(0), Some(120))
      .union(request("rA", variantA, 1, None, None))
      .union(request("rA", 999L, 3, None, None))
    val out = Predictor.resolve(reqs, general, curveSets, defaults, schedule.routes)
    assert(out.count() == 3)
    assert(out.select("precision_type").collect().map(_.getInt(0)).toSet.size == 3)
  }
}
