package graft.monitor

import graft.SparkSpec
import graft.gtfs.GtfsStatic
import java.time.LocalDate

class JourneyDataSpec extends SparkSpec {

  private lazy val schedule = GtfsStatic.read(spark, "fixtures/gtfs_tiny")

  test("F12: stop search requires all terms, ordered, limited") {
    val r = JourneyData.searchStops(schedule.stops, "doms west")
      .collect().map(_.getString(0))
    assert(r.toSeq == Seq("s6")) // only "Domsheide West" has both terms
    val all = JourneyData.searchStops(schedule.stops, "doms")
      .collect().map(_.getString(0))
    assert(all.toSet == Set("s2", "s6"))
  }

  test("J8: trip resolution by (headsign, route, type, stop, time, date±1)") {
    // tA1 departs s1 at 08:01:00 on weekdays
    val hit = JourneyData.resolveTrip(spark, schedule,
      headsign = "Universitaet", routeShortName = "4", routeType = 3,
      stopId = "s1", departureSecsOfDay = 8 * 3600 + 60,
      date = LocalDate.of(2024, 3, 15))
    assert(hit.select("trip_id").collect().map(_.getString(0)).toSet == Set("tA1"))
    // wrong route type -> no hit
    val miss = JourneyData.resolveTrip(spark, schedule,
      "Universitaet", "4", routeType = 2, "s1", 8 * 3600 + 60,
      LocalDate.of(2024, 3, 15))
    assert(miss.count() == 0)
  }

  test("journey chain: two legs with a walk match the hand-computed chain") {
    import JourneyData.JourneyChain._
    import graft.curves.{Curve, CurveBuilder}
    val t0 = 1700000000L
    // leg 1: departs t0+600 (curve support ±120 s), arrives t0+1800
    val dep1 = Curve(Vector((-120f, 0f), (120f, 1f)))
    val arr1 = Curve(Vector((-60f, 0f), (180f, 1f)))
    // leg 2: departs t0+2400, arrives t0+3300
    val dep2 = Curve(Vector((-90f, 0f), (90f, 1f)))
    val arr2 = Curve(Vector((0f, 0f), (240f, 1f)))
    val legs = Seq(
      Ride(dep1, t0 + 600, arr1, t0 + 1800),
      Walk(150f),
      Ride(dep2, t0 + 2400, arr2, t0 + 3300))
    val end = chain(t0, legs)

    // hand-computed walk: the same convolution chain, step by step
    val s0 = Curve(Vector((-30f, 0f), (30f, 1f)))
    val shifted0 = Curve(s0.points.map { case (x, y) => (x - 600f, y) })
    val p1 = Curve.transferProbability(shifted0, dep1)
    val walked = Curve.convolve(arr1, CurveBuilder.walkCurve(150f))
    val shifted1 = Curve(walked.points.map { case (x, y) => (x + (1800f - 2400f), y) })
    val p2 = Curve.transferProbability(shifted1, dep2)

    assert(end.probability == p1 * p2)
    assert(end.curve.points == arr2.points) // final position: last arrival curve
    assert(end.refSecs == t0 + 3300)
    // sanity: an early start makes the first boarding certain, and a missed
    // first connection kills the product
    assert(p1 > 0.99f)
    val late = chain(t0 + 3600, legs)
    assert(late.probability < 0.01f)
  }

  test("C17/W8: sub-trip containment and greedy variant cover") {
    assert(JourneyData.isSubTrip(Seq("a", "b", "c", "d"), Seq("b", "c")))
    assert(JourneyData.isSubTrip(Seq("a", "b", "c", "d"), Seq("c", "b"))) // reversed
    assert(!JourneyData.isSubTrip(Seq("a", "b", "c", "d"), Seq("a", "c")))
    val lists = JourneyData.variantStopLists(schedule)
      .collect().map(r => (r.getLong(1),
        r.getAs[scala.collection.Seq[String]]("stop_ids").toSeq)).toSeq
    // rA has full (s1..s4) and short (s1..s3) variants; short is covered
    val rAcover = JourneyData.greedyVariantCover(
      lists.filter { case (_, s) => s.head == "s1" && s.length >= 3 })
    val full = lists.find(_._2 == Seq("s1", "s2", "s3", "s4")).get._1
    assert(rAcover.contains(full))
    val short = lists.find(_._2 == Seq("s1", "s2", "s3")).get._1
    assert(!rAcover.contains(short))
  }
}
