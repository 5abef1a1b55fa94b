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
