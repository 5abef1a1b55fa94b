package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming anomaly monitor: hours close exactly once in event-time
  * order as the watermark passes, the z chain matches the batch q118
  * query bit-for-bit, and state stays bounded. */
class AnomalyStreamSpec extends SparkSpec {

  private val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
  private def at(h: Int, m: Int = 0) =
    new java.sql.Timestamp(base.getTime + h * 3600L * 1000 + m * 60000L)

  // type A: alternating 2/3 per hour for hours 0-24, spike of 80 at 25
  private def fixture: Seq[(String, java.sql.Timestamp)] =
    (0 until 25).flatMap(h =>
      Seq.fill(if (h % 2 == 0) 2 else 3)(("A", at(h, 10)))) ++
      Seq.fill(80)(("A", at(25, 10)))

  test("hours close once, in order, and the spike's z matches the batch chain") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Timestamp)]
    val out = AnomalyStream.hourScores(input.toDS().toDF("event_type", "ts"))
      .writeStream.format("memory").queryName("anom")
      .outputMode("append").start()
    def rows() = spark.table("anom").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2), r.getInt(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      .sortBy(_._2.getTime)

    // two uneven chunks, then a pusher event far ahead to advance the
    // watermark past the spike hour
    val all = fixture
    input.addData(all.take(37))
    out.processAllAvailable()
    input.addData(all.drop(37))
    out.processAllAvailable()
    input.addData(("A", at(40)))
    out.processAllAvailable()
    val got = rows()
    // hours 0..25 closed exactly once each, ascending
    assert(got.map(_._2).toSeq == (0 to 25).map(h => at(h, 0)).toSeq)
    assert(got.map(_._3).toSeq ==
      (0 until 25).map(h => if (h % 2 == 0) 2L else 3L) :+ 80L)
    // warm-up hours carry their partial base size and no z beyond 24
    assert(got.take(24).map(_._4).toSeq == (0 until 24))
    // the spike hour: n_base 24, z = the exact batch chain
    val spike = got.last
    val counts = (1 to 24).map(h => if (h % 2 == 0) 2.0 else 3.0)
    val sx = counts.sum; val sxx = counts.map(c => c * c).sum
    val variance = (sxx - sx * sx / 24) / 24
    val z = (80.0 - sx / 24) / math.sqrt(variance)
    assert(spike._4 == 24 && spike._5.contains(z))
    out.stop()
  }

  test("streaming flagged hours equal the batch q118 on the same data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(5)
    val events = (0 until 30).flatMap { h =>
      val c = if (h == 27) 60 else 3 + rnd.nextInt(3)
      Seq.fill(c)(("B", at(h, 30)))
    }
    // batch side: the registered q118 over the same rows
    val dir = java.nio.file.Files.createTempDirectory("graft-anomb").toString
    events.zipWithIndex
      .map { case ((t, ts), i) => (i.toLong, ts, i.toLong % 5, t, 1.0, "p") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = graft.operators.RelationalQueries.registry("q118_hourly_anomaly")
      .build(spark, dir).collect()
      .map(r => (r.getTimestamp(1), r.getLong(2), r.getDouble(4))).toSet
    // streaming side: all data, then a watermark pusher
    val input = MemoryStream[(String, java.sql.Timestamp)]
    val out = AnomalyStream.hourScores(input.toDS().toDF("event_type", "ts"))
      .writeStream.format("memory").queryName("anom_batch_twin")
      .outputMode("append").start()
    input.addData(events)
    out.processAllAvailable()
    input.addData(("B", at(45)))
    out.processAllAvailable()
    val streamed = spark.table("anom_batch_twin").collect()
      .map(r => (r.getTimestamp(1), r.getLong(2), r.getInt(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      .collect { case (h, c, 24, Some(z)) if math.abs(z) >= 3 => (h, c, z) }
      .toSet
    assert(streamed == batch, s"stream $streamed vs batch $batch")
    out.stop()
  }
}
