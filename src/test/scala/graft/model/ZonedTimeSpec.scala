package graft.model

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Date

/** DST correctness of the noon-anchored C4 rule (SURVEY.md §7.4.2):
  * Europe/Berlin springs forward 2024-03-31 02:00 -> 03:00. */
class ZonedTimeSpec extends SparkSpec {

  test("instantColumnZoned: noon anchor is DST-correct, midnight anchor is not") {
    import spark.implicits._
    val df = Seq(
      (Date.valueOf("2024-03-30"), 8 * 3600), // regular CET day
      (Date.valueOf("2024-03-31"), 8 * 3600), // spring-forward day
      (Date.valueOf("2024-03-31"), 1 * 3600)) // before the gap
      .toDF("service_day", "secs")
      .select(col("service_day"), col("secs"),
        GtfsTime.instantColumnZoned(col("service_day"), col("secs"), "Europe/Berlin")
          .cast("string").as("zoned"))
      .collect()
    // 2024-03-30 08:00 CET = 07:00 UTC
    assert(df(0).getString(2) == "2024-03-30 07:00:00")
    // 2024-03-31 08:00 CEST = 06:00 UTC — noon-anchored: 12:00 CEST (10:00Z) - 4h
    assert(df(1).getString(2) == "2024-03-31 06:00:00")
    // "01:00:00" on the gap day = noon minus 11 REAL hours (the GTFS rule
    // counts real seconds from noon, so pre-gap times shift with the lost
    // hour): 10:00Z - 11h = 2024-03-30 23:00Z — NOT the naive 00:00Z
    assert(df(2).getString(2) == "2024-03-30 23:00:00")
  }

  test("zoned and UTC anchors agree on non-DST zones") {
    import spark.implicits._
    val r = Seq((Date.valueOf("2024-03-31"), 25 * 3600)) // >24h time
      .toDF("service_day", "secs")
      .select(
        GtfsTime.instantColumn(col("service_day"), col("secs")).cast("string").as("utc"),
        GtfsTime.instantColumnZoned(col("service_day"), col("secs"), "UTC")
          .cast("string").as("zoned"))
      .collect().head
    assert(r.getString(0) == r.getString(1))
    assert(r.getString(0) == "2024-04-01 01:00:00")
  }
}
