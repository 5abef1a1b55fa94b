package graft.model

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import java.time.LocalDateTime

/** The Catalyst CASE chain must agree with the Scala classifier on every
  * (weekday, hour) cell — the exhaustive 7x24 grid, not samples. */
class SlotColumnSpec extends SparkSpec {
  test("slotIdColumn == fromDateTime over the full weekday x hour grid") {
    import spark.implicits._
    val cells = for {
      day <- 1 to 7 // 2024-01-01 is a Monday
      hour <- 0 until 24
    } yield LocalDateTime.of(2024, 1, day, hour, 30)
    val expected = cells.map(dt => TimeSlot.fromDateTime(dt).id)
    val actual = cells.map(Timestamp.valueOf).toDF("ts")
      .select(TimeSlot.slotIdColumn(col("ts")).as("slot"))
      .collect().map(_.getInt(0)).toSeq
    assert(actual == expected)
  }
}
