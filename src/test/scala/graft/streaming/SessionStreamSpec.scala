package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class SessionStreamSpec extends SparkSpec {

  private def ts(secs: Long) = new java.sql.Timestamp(secs * 1000L)

  test("batch session windows: gap merge, touching windows merge, split only at gap > 2h") {
    import spark.implicits._
    val df = Seq(
      // user 1: 0 s and 3600 s merge (gap 1 h); 10800 s sits at EXACTLY
      // 2 h after 3600 s -> the [ts, ts+gap) windows TOUCH and Spark
      // merges them (same boundary semantics as q91's lag construction)
      (1L, ts(0)), (1L, ts(3600)), (1L, ts(10800)),
      // user 2: gap 7201 s > 2 h -> split
      (2L, ts(100)), (2L, ts(7301)),
      (3L, ts(50))
    ).toDF("user_id", "ts")
    val got = SessionStream.sessionWindows(df).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000L,
        r.getTimestamp(2).getTime / 1000L, r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got === Seq(
      (1L, 0L, 18000L, 3L),     // w_end = last event 10800 + 7200
      (2L, 100L, 7300L, 1L),    // strictly-greater gap splits
      (2L, 7301L, 14501L, 1L),
      (3L, 50L, 7250L, 1L)))
  }

  test("streaming sessions == batch across uneven micro-batch splits; append emits once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val out = SessionStream.sessionStream(input.toDS().toDF("user_id", "ts"))
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // one user's session SPLIT across micro-batches; a second session
      // for users 1/2 lands later
      input.addData((1L, ts(0)), (2L, ts(500)))
      out.processAllAvailable()
      input.addData((1L, ts(3600)), (3L, ts(1000)))
      out.processAllAvailable()
      input.addData((1L, ts(20000)), (2L, ts(21000)))
      out.processAllAvailable()
      // two sentinel batches: watermark for batch N uses data through
      // N-1, so the first closes the early sessions, the second closes
      // the 20000/21000 ones
      input.addData((99L, ts(100000)))
      out.processAllAvailable()
      input.addData((99L, ts(200000)))
      out.processAllAvailable()
      val events = Seq((1L, ts(0)), (2L, ts(500)), (1L, ts(3600)),
        (3L, ts(1000)), (1L, ts(20000)), (2L, ts(21000)))
      def shape(rows: Array[org.apache.spark.sql.Row]) = rows
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
          r.getTimestamp(2).getTime, r.getLong(3),
          r.getTimestamp(4).getTime, r.getTimestamp(5).getTime))
        .sortBy(t => (t._1, t._2)).toSeq
      val streamed = shape(spark.table("sessions")
        .filter("user_id <> 99").collect())
      val batch = shape(SessionStream.sessionWindows(
        events.toDF("user_id", "ts")).collect())
      // every closed session emitted EXACTLY once, bit-equal to batch
      assert(streamed === batch)
      assert(streamed.map(t => (t._1, t._2)).distinct.size === streamed.size)
    } finally out.stop()
  }
}
