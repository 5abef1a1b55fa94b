package graft.gtfs

import java.nio.file.{Files, Paths}

/** Deterministic generator for `fixtures/rt_tiny/` (run once, output
  * committed): 40 weekday mornings of GTFS-RT feeds for trip tA1 of the
  * gtfs_tiny schedule — delays 12*i at stop 1, +24 at stop 2, +48 at
  * stop 4, stop 3 deliberately absent (exercises the W1 gap fill), plus a
  * tB2 night-trip update and a ghost trip (J1 skip path) sprinkled in. */
object RtFixtureGen {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(if (args.nonEmpty) args(0) else "fixtures/rt_tiny")
    Files.createDirectories(outDir)
    var day = java.time.LocalDate.of(2024, 3, 4)
    for (i <- 0 until 40) {
      val d = 12 * i
      val dateStr = day.format(java.time.format.DateTimeFormatter.BASIC_ISO_DATE)
      val ts = day.toEpochDay * 86400 + 8 * 3600 + 25 * 60
      def ev(delay: Int) = Some(GtfsRt.StopTimeEvent(Some(delay), None))
      val updates = Seq(
        GtfsRt.TripUpdate(
          GtfsRt.TripDescriptor(Some("tA1"), Some("rA"),
            startTime = Some("08:00:00"), startDate = Some(dateStr)),
          Seq(
            GtfsRt.StopTimeUpdate(Some(1), Some("s1"), None, ev(d)),
            GtfsRt.StopTimeUpdate(Some(2), Some("s2"), ev(d + 24), ev(d + 24)),
            GtfsRt.StopTimeUpdate(Some(4), Some("s4"), ev(d + 48), None)))) ++
        (if (i % 10 == 0)
          Seq(GtfsRt.TripUpdate(
            GtfsRt.TripDescriptor(Some("ghost"), None,
              startTime = Some("08:00:00"), startDate = Some(dateStr)),
            Seq(GtfsRt.StopTimeUpdate(Some(1), Some("sX"), ev(5), None))))
        else Nil) ++
        (if (i % 5 == 0)
          Seq(GtfsRt.TripUpdate(
            GtfsRt.TripDescriptor(Some("tB2"), Some("rB"),
              startTime = Some("23:50:00"), startDate = Some(dateStr)),
            Seq(GtfsRt.StopTimeUpdate(Some(2), Some("s7"), ev(30 + i), ev(35 + i)))))
        else Nil)
      val bytes = GtfsRt.encode(GtfsRt.FeedMessage(Some(ts), updates))
      Files.write(outDir.resolve(f"feed_${day}T08-25-00.pb"), bytes)
      day = day.plusDays(if (day.getDayOfWeek.getValue == 5) 3 else 1) // weekdays
    }
    println(s"wrote 40 feeds to $outDir")
  }
}
