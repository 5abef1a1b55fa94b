package graft.model

import java.time.{DayOfWeek, LocalDateTime}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Event types (reference `src/types/event_type.rs:9-21`). */
object EventType {
  val Arrival = 1
  val Departure = 2
  val Types: Seq[Int] = Seq(Arrival, Departure)
}

/** Provenance of a prediction (reference `src/types/mod.rs:42-58`). */
object OriginType {
  val Unknown = 0
  val Realtime = 1
  val Schedule = 2
}

/** Precision fallback ladder, most to least precise
  * (reference `src/types/mod.rs:64-98`). */
object PrecisionType {
  val Specific = 0
  val FallbackSpecific = 1
  val SemiSpecific = 2
  val General = 3
  val FallbackGeneral = 4
  val SuperGeneral = 5
  val Unknown = 6
}

/** A repeating weekday×hour window (reference `src/types/time_slots.rs:16-244`).
  * Weekdays are 0=Mon..6=Sun (chrono's num_days_from_monday); hour ranges are
  * [min, max) with wraparound when min > max (night slots), and weekday ranges
  * wrap likewise. */
final case class TimeSlot(id: Int, description: String,
                          minWeekday: Int, maxWeekday: Int,
                          minHour: Int, maxHour: Int) {
  /** Reference `TimeSlot::matches` (`src/types/time_slots.rs:168-201`). */
  def matches(weekdayMon0: Int, hour: Int): Boolean = {
    val day =
      (weekdayMon0 >= minWeekday && weekdayMon0 <= maxWeekday) ||
      (minWeekday > maxWeekday && (weekdayMon0 >= minWeekday || weekdayMon0 <= maxWeekday))
    val hourOk =
      (hour >= minHour && hour < maxHour) ||
      (minHour > maxHour && (hour >= minHour || hour < maxHour))
    day && hourOk
  }
  def matches(dt: LocalDateTime): Boolean =
    matches(dt.getDayOfWeek.getValue - 1, dt.getHour)
}

object TimeSlot {
  // Taxonomy from `src/types/time_slots.rs:27-124`.
  val WorkdayMorning       = TimeSlot(1, "Workdays from 4 to 6h", 0, 4, 4, 6)
  val WorkdayMorningRush   = TimeSlot(2, "Workdays from 6 to 8h", 0, 4, 6, 8)
  val WorkdayLateMorning   = TimeSlot(3, "Workdays from 8 to 12h", 0, 4, 8, 12)
  val WorkdayNoonRush      = TimeSlot(4, "Workdays from 12 to 14h", 0, 4, 12, 14)
  val WorkdayAfternoon     = TimeSlot(5, "Workdays from 14 to 16h", 0, 4, 14, 16)
  val WorkdayAfternoonRush = TimeSlot(6, "Workdays from 16 to 18h", 0, 4, 16, 18)
  val WorkdayEvening       = TimeSlot(7, "Workdays from 18 to 20h", 0, 4, 18, 20)
  val SaturdayDay          = TimeSlot(8, "Saturdays from 4 to 20h", 5, 5, 4, 20)
  val SundayDay            = TimeSlot(9, "Sundays from 4 to 20h", 6, 6, 4, 20)
  val NightBeforeWorkday   = TimeSlot(10, "Nights before workdays from 20 to 4h", 6, 3, 20, 4)
  val NightBeforeWeekend   = TimeSlot(11, "Nights before weekend days from 20 to 4h", 4, 5, 20, 4)
  val Default              = TimeSlot(12, "Always", 0, 6, 0, 24)

  val Slots: Seq[TimeSlot] = Seq(
    WorkdayMorning, WorkdayMorningRush, WorkdayLateMorning, WorkdayNoonRush,
    WorkdayAfternoon, WorkdayAfternoonRush, WorkdayEvening, SaturdayDay,
    SundayDay, NightBeforeWorkday, NightBeforeWeekend)
  val SlotsWithDefault: Seq[TimeSlot] = Slots :+ Default

  /** The C5 classifier as a DuckDB CASE chain over a timestamp expression
    * `ts` (isodow 1=Mon..7=Sun → wd0 = isodow-1) — the SINGLE generator
    * shared by every oracle that reimplements slot assignment (q17, q53);
    * a taxonomy change then moves all oracles together. */
  def duckDbCaseSql(ts: String): String = {
    val cases = Slots.map { t =>
      val day =
        if (t.minWeekday <= t.maxWeekday) s"(isodow($ts)-1 BETWEEN ${t.minWeekday} AND ${t.maxWeekday})"
        else s"(isodow($ts)-1 >= ${t.minWeekday} OR isodow($ts)-1 <= ${t.maxWeekday})"
      val hour =
        if (t.minHour <= t.maxHour) s"(hour($ts) >= ${t.minHour} AND hour($ts) < ${t.maxHour})"
        else s"(hour($ts) >= ${t.minHour} OR hour($ts) < ${t.maxHour})"
      s"WHEN $day AND $hour THEN ${t.id}"
    }.mkString(" ")
    s"CASE $cases ELSE ${Default.id} END"
  }

  /** First matching slot, like the reference's `from_datetime`
    * (`src/types/time_slots.rs:156-165`); total over all datetimes. */
  def fromDateTime(dt: LocalDateTime): TimeSlot =
    Slots.find(_.matches(dt)).getOrElse(
      throw new IllegalStateException("invalid time slot definition"))

  /** Catalyst expression computing the slot id for a timestamp column —
    * a codegen-friendly CASE chain, no UDF. Spark's dayofweek is
    * 1=Sun..7=Sat; convert to 0=Mon..6=Sun. */
  def slotIdColumn(ts: Column): Column = {
    val wd = (dayofweek(ts) + lit(5)) % lit(7) // 0=Mon..6=Sun
    val hr = hour(ts)
    def slotMatch(s: TimeSlot): Column = {
      val day =
        if (s.minWeekday <= s.maxWeekday) wd.between(s.minWeekday, s.maxWeekday)
        else wd >= s.minWeekday || wd <= s.maxWeekday
      val hourOk =
        if (s.minHour <= s.maxHour) hr >= s.minHour && hr < s.maxHour
        else hr >= s.minHour || hr < s.maxHour
      day && hourOk
    }
    Slots.foldRight(lit(TimeSlot.Default.id)) { (s, acc) =>
      when(slotMatch(s), lit(s.id)).otherwise(acc)
    }
  }
}

/** Beginning/Middle/End of a trip (reference `src/types/route_sections.rs:7-52`). */
object RouteSection {
  val Beginning = 0
  val Middle = 1
  val End = 2

  /** section_size = min(5, stop_count/3); index < size -> Beginning;
    * stop_count - index <= size -> End; else Middle
    * (reference `get_route_section_by_stop_index`, `:37-52`). */
  def byStopIndex(stopIndex: Int, stopCount: Int): Int = {
    val size = math.min(5, stopCount / 3)
    if (stopIndex < size) Beginning
    else if (stopCount - stopIndex <= size) End
    else Middle
  }

  /** Same rule as a Catalyst expression. */
  def sectionColumn(stopIndex: Column, stopCount: Column): Column = {
    val size = least(lit(5), (stopCount / lit(3)).cast("int"))
    when(stopIndex < size, lit(Beginning))
      .when(stopCount - stopIndex <= size, lit(End))
      .otherwise(lit(Middle))
  }
}

/** GTFS service-day time math (reference `src/types/gtfs_time.rs` and
  * `date_and_time` `src/main.rs:418-442`): a (service_day, seconds) pair
  * where seconds may exceed 24 h or be negative; the absolute instant is
  * `service_day 12:00 + (seconds - 12 h)` — the GTFS "noon minus 12 h" rule,
  * DST-correct because the anchor is noon. */
object GtfsTime {
  /** Parse "H:MM:SS" (hours may exceed 24) into seconds since service-day
    * midnight (reference `from_trip_descriptor`, `gtfs_time.rs:22-46`). */
  def parseTimeToSeconds(s: String): Option[Int] = {
    val re = raw"(\d+):(\d+):(\d+)".r
    re.findFirstMatchIn(s).map(m =>
      m.group(1).toInt * 3600 + m.group(2).toInt * 60 + m.group(3).toInt)
  }

  /** Column version: seconds since service-day midnight from "HH:MM:SS". */
  def timeToSecondsColumn(c: Column): Column = {
    val parts = split(c, ":")
    (parts.getItem(0).cast("int") * 3600 +
      parts.getItem(1).cast("int") * 60 +
      parts.getItem(2).cast("int"))
  }

  /** Absolute instant as a Catalyst expression: service_day (DateType) at
    * noon plus (seconds - 43200). In UTC (session zone) noon-anchored math
    * degenerates to midnight + seconds, which is what this computes; for a
    * DST-shifting agency zone use [[instantColumnZoned]]. */
  def instantColumn(serviceDay: Column, seconds: Column): Column =
    timestamp_add("SECOND", seconds, to_timestamp(serviceDay))

  /** DST-correct C4 (the reference's `date_and_time`, `src/main.rs:418-442`):
    * the instant is LOCAL NOON of the service day (unambiguous across DST
    * transitions — the 02:00-03:00 gap/overlap never contains noon) plus
    * (seconds − 12 h). On the spring-forward day a "08:00:00" stop time is
    * one wall-clock hour after "07:00:00" but only 3600 real seconds, which
    * midnight-anchored math gets wrong by an hour. Returns a UTC timestamp. */
  def instantColumnZoned(serviceDay: Column, seconds: Column, zone: String): Column =
    timestamp_add("SECOND", seconds - lit(43200),
      to_utc_timestamp(concat(serviceDay.cast("string"), lit(" 12:00:00")), zone))
}
