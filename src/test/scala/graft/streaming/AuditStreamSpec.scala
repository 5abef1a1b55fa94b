package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming audit: running counters must accumulate across micro-batches,
  * match the batch rules exactly, and keep single-row state. */
class AuditStreamSpec extends SparkSpec {

  test("running rule counters accumulate across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Option[Double])]
    val out = AuditStream.eventAudit(input.toDS().toDF("event_id", "value"))
      .writeStream.format("memory").queryName("audit_counts")
      .outputMode("complete").start()
    def counts() = spark.table("audit_counts")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

    input.addData((1L, Some(1.0)), (2L, None), (3L, Some(-2.0)))
    out.processAllAvailable()
    assert(counts() == Map(
      "value_complete" -> (1L, 3L), "value_nonnegative" -> (1L, 3L)))

    // second batch: one more null, two clean rows — totals accumulate
    input.addData((4L, None), (5L, Some(2.0)), (6L, Some(0.0)))
    out.processAllAvailable()
    assert(counts() == Map(
      "value_complete" -> (2L, 6L), "value_nonnegative" -> (1L, 6L)))
    out.stop()
  }

  test("streaming totals equal the batch rules on the same data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = (0 until 200).map(i =>
      (i.toLong, if (i % 7 == 0) None else Some(i - 50.0)))
    val input = MemoryStream[(Long, Option[Double])]
    val out = AuditStream.eventAudit(input.toDS().toDF("event_id", "value"))
      .writeStream.format("memory").queryName("audit_batch_twin")
      .outputMode("complete").start()
    // uneven micro-batch split
    input.addData(rows.take(37))
    out.processAllAvailable()
    input.addData(rows.drop(37))
    out.processAllAvailable()
    val got = spark.table("audit_batch_twin")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = Map(
      "value_complete" -> (rows.count(_._2.isEmpty).toLong, rows.size.toLong),
      "value_nonnegative" -> (rows.count(_._2.exists(_ < 0)).toLong, rows.size.toLong))
    assert(got == want)
    out.stop()
  }
}
