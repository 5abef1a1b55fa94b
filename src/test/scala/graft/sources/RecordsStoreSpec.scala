package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.{Date, Timestamp}

/** Bucketing removes the scan-side shuffle from vehicle-keyed operations —
  * asserted on the physical plan, not just timings. */
class RecordsStoreSpec extends SparkSpec {

  test("bucketed self-join on trip_id plans without a scan-side Exchange") {
    import spark.implicits._
    val records = (0 until 100).flatMap { i =>
      (1 to 4).map(seq => (s"t${i % 10}", Date.valueOf("2024-03-15"), 8 * 3600,
        seq, 60 * seq, new Timestamp(1000L)))
    }.toDF("trip_id", "trip_start_date", "trip_start_time",
      "stop_sequence", "delay", "time_of_recording")

    RecordsStore.saveBucketed(records, "records_bucketed_test", buckets = 4)
    try {
      val t = RecordsStore.load(spark, "records_bucketed_test")
      val a = t.select(col("trip_id"), col("stop_sequence").as("s1"), col("delay").as("d1"))
      val b = t.select(col("trip_id"), col("stop_sequence").as("s2"), col("delay").as("d2"))
      val joined = a.join(b, Seq("trip_id")).filter(col("s1") < col("s2"))
      val plan = joined.queryExecution.executedPlan.toString
      // SortMergeJoin over two bucketed scans: no Exchange below the join
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffle-family join over bucketed scans, got:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not re-shuffle the scans:\n$plan")
      assert(joined.count() == 100 * (10 * 6)) // 10 trips x C(4,2) pairs x 10 dup vehicles
    } finally spark.sql("DROP TABLE IF EXISTS records_bucketed_test")
  }
}
