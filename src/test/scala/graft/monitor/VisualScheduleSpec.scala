package graft.monitor

import graft.SparkSpec
import graft.gtfs.GtfsStatic
import org.apache.spark.sql.functions._
import java.sql.{Date, Timestamp}

/** S9 data layer: the visual-schedule relation (stop axes from the W8
  * cover, C17 containment assignment, scheduled + observed times). */
class VisualScheduleSpec extends SparkSpec {

  private lazy val schedule = GtfsStatic.read(spark, "fixtures/gtfs_tiny")

  private lazy val records = {
    import spark.implicits._
    Seq(("src", "rA", "tA1", Date.valueOf("2024-03-15"), 8 * 3600, 2, "s2",
      new Timestamp(1000L), Some(90), Some(120)))
      .toDF("source", "route_id", "trip_id", "trip_start_date",
        "trip_start_time", "stop_sequence", "stop_id", "time_of_recording",
        "delay_arrival", "delay_departure")
      .join(GtfsStatic.routeVariants(schedule.trips, schedule.stopTimes), Seq("trip_id"))
  }

  test("weekday: both full trips on one axis, observed times where recorded") {
    val d = VisualSchedule.data(spark, records, schedule, "rA",
      java.time.LocalDate.of(2024, 3, 15)).cache()
    assert(d.count() == 8) // tA1 + tA2, 4 stops each; tA3 not active Friday
    assert(d.select("axis_variant").distinct().count() == 1)
    val observed = d.filter(col("trip_id") === "tA1" && col("stop_index") === 1)
      .collect().head
    // 08:05:00 arr + 90 s delay; 08:06:00 dep + 120 s
    assert(observed.getAs[Int]("actual_arrival_secs") == 8 * 3600 + 5 * 60 + 90)
    assert(observed.getAs[Int]("actual_departure_secs") == 8 * 3600 + 6 * 60 + 120)
    // stops without records keep null observed times
    assert(d.filter(col("actual_arrival_secs").isNull).count() == 7)
  }

  test("weekend: the short variant rides the covering full axis (C17)") {
    val d = VisualSchedule.data(spark, records, schedule, "rA",
      java.time.LocalDate.of(2024, 3, 16)).cache()
    assert(d.select("trip_id").distinct().collect().map(_.getString(0)).toSeq == Seq("tA3"))
    assert(d.count() == 3)
    // the 3-stop variant is a sub-trip of the 4-stop axis: same axis id
    val full = records.select("route_variant").distinct().collect().head.getLong(0)
    assert(d.select("axis_variant").distinct().collect().head.getLong(0) == full)
    assert(d.select("route_variant").distinct().collect().head.getLong(0) != full)
  }
}
