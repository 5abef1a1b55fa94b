package graft.model

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import java.time.LocalDateTime

class ClassifierSpec extends AnyFunSuite with graft.GenSampling {

  test("TimeSlot: canonical examples from the reference taxonomy") {
    // Monday 05:00 -> WorkdayMorning (slot 1)
    assert(TimeSlot.fromDateTime(LocalDateTime.of(2024, 1, 1, 5, 0)).id == 1)
    // Monday 07:30 -> morning rush
    assert(TimeSlot.fromDateTime(LocalDateTime.of(2024, 1, 1, 7, 30)).id == 2)
    // Saturday 12:00 -> SaturdayDay
    assert(TimeSlot.fromDateTime(LocalDateTime.of(2024, 1, 6, 12, 0)).id == 8)
    // Sunday 12:00 -> SundayDay
    assert(TimeSlot.fromDateTime(LocalDateTime.of(2024, 1, 7, 12, 0)).id == 9)
    // Sunday 22:00 -> night before workday (slot 10: Sun-Thu 20-4 wraparound)
    assert(TimeSlot.fromDateTime(LocalDateTime.of(2024, 1, 7, 22, 0)).id == 10)
    // Monday 02:00 -> night before workday too (hour wraparound)
    assert(TimeSlot.fromDateTime(LocalDateTime.of(2024, 1, 1, 2, 0)).id == 10)
    // Friday 23:00 -> night before weekend day (slot 11)
    assert(TimeSlot.fromDateTime(LocalDateTime.of(2024, 1, 5, 23, 0)).id == 11)
    // Saturday 03:00 -> night before weekend day
    assert(TimeSlot.fromDateTime(LocalDateTime.of(2024, 1, 6, 3, 0)).id == 11)
  }

  test("TimeSlot: every datetime matches exactly one non-default slot") {
    val gen = for {
      day <- Gen.choose(1, 28)
      hour <- Gen.choose(0, 23)
    } yield LocalDateTime.of(2024, 1, day, hour, 30)
    forAllSamples(gen) { dt =>
      val matching = TimeSlot.Slots.filter(_.matches(dt))
      assert(matching.length == 1, s"$dt matched ${matching.map(_.id)}")
    }
  }

  test("RouteSection: boundary cases of min(5, n/3)") {
    // 9 stops -> size 3: idx 0-2 Beginning, 3-5 Middle, 6-8 End
    assert(RouteSection.byStopIndex(0, 9) == RouteSection.Beginning)
    assert(RouteSection.byStopIndex(2, 9) == RouteSection.Beginning)
    assert(RouteSection.byStopIndex(3, 9) == RouteSection.Middle)
    assert(RouteSection.byStopIndex(5, 9) == RouteSection.Middle)
    assert(RouteSection.byStopIndex(6, 9) == RouteSection.End)
    // 30 stops -> size capped at 5
    assert(RouteSection.byStopIndex(4, 30) == RouteSection.Beginning)
    assert(RouteSection.byStopIndex(5, 30) == RouteSection.Middle)
    assert(RouteSection.byStopIndex(24, 30) == RouteSection.Middle)
    assert(RouteSection.byStopIndex(25, 30) == RouteSection.End)
    // tiny trip: 2 stops -> size 0, nothing qualifies as Beginning/End
    assert(RouteSection.byStopIndex(0, 2) == RouteSection.Middle)
  }

  test("GtfsTime: parses >24h and computes seconds") {
    assert(GtfsTime.parseTimeToSeconds("25:10:05").contains(25 * 3600 + 10 * 60 + 5))
    assert(GtfsTime.parseTimeToSeconds("00:00:00").contains(0))
    assert(GtfsTime.parseTimeToSeconds("7:05:00").contains(7 * 3600 + 300))
    assert(GtfsTime.parseTimeToSeconds("garbage").isEmpty)
  }
}
