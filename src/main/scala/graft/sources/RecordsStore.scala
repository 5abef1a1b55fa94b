package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The records table's at-scale physical layout.
  *
  * The analyse pipeline's dominant costs are all keyed by the vehicle
  * (trip_id, trip_start_date, trip_start_time): the gap-fill window (W1),
  * the stop-pair self-join (J3), and last-wins dedup (W2) each demand a
  * shuffle on that key. Bucketing the stored table by trip_id removes the
  * scan-side Exchange from every one of them — at 100 TB that is the
  * difference between re-shuffling the fact table per query and reading it
  * pre-clustered.
  *
  * Partitioning by trip_start_date (coarse, date-pruned) + bucketing by
  * trip_id (fine, join/window-aligned) mirrors the reference's per-schedule
  * batching (S4) and its (route, variant)-scoped scans (S6): date
  * partitions prune time ranges, buckets co-locate each vehicle's rows.
  */
object RecordsStore {

  /** Save bucketed: requires a table catalog (saveAsTable), buckets=256 is
    * sized for ~100 TB / 256 ≈ 400 GB per bucket-chain before date
    * partitioning splits it further. Local tests use a smaller count. */
  def saveBucketed(records: DataFrame, table: String, buckets: Int = 256): Unit =
    records.write
      .mode("overwrite")
      .partitionBy("trip_start_date")
      .bucketBy(buckets, "trip_id")
      .sortBy("trip_id", "stop_sequence")
      .format("parquet")
      .saveAsTable(table)

  def load(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
