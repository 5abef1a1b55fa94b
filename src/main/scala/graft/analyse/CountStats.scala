package graft.analyse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The `analyse count` mode (reference `src/analyser/count.rs:15-80` —
  * SURVEY.md A1/A2/S8): per-interval record counts and mean arrival delay,
  * plus rt-file counts/bytes from the file listing, written as a
  * semicolon-separated CSV (`time_min;time_max;count;avg;files;bytes`).
  *
  * The reference loops over buckets issuing one SQL query each; the Spark
  * form is a single tumbling-window aggregation (one shuffle), with the
  * file stats joined in from `binaryFile` metadata. */
object CountStats {

  /** F1 validity window (reference `count.rs:51-52`). */
  val DelayValidity = 36000

  def recordBuckets(records: DataFrame, intervalSeconds: Long): DataFrame =
    records
      .filter(col("delay_arrival").isNull ||
        col("delay_arrival").between(-DelayValidity, DelayValidity))
      .groupBy(window(col("time_of_recording"), s"$intervalSeconds seconds").as("w"))
      .agg(count(lit(1)).as("count"), avg(col("delay_arrival")).as("avg"))
      .select(col("w.start").as("time_min"), col("w.end").as("time_max"),
        col("count"), col("avg"))

  /** File stats from binaryFile metadata; the bucket comes from the ISO
    * timestamp in the file NAME (C2, reference `src/analyser/mod.rs:191-197`)
    * — not mtime, matching the reference's filename parsing. */
  def fileBuckets(spark: SparkSession, rtDir: String, intervalSeconds: Long): DataFrame = {
    // file names carry "YYYY-MM-DDTHH-MM-SS" or with ':' separators
    val fileTs = to_timestamp(concat(
      regexp_extract(col("path"), raw"(\d{4}-\d{2}-\d{2})T", 1), lit(" "),
      translate(regexp_extract(col("path"), raw"T(\d{2}[:\-]\d{2}[:\-]\d{2})", 1), "-", ":")))
    spark.read.format("binaryFile").load(rtDir)
      .select(col("path"), col("length"))
      .withColumn("file_ts", fileTs)
      .filter(col("file_ts").isNotNull)
      .groupBy(window(col("file_ts"), s"$intervalSeconds seconds").as("w"))
      .agg(count(lit(1)).as("files"), sum(col("length")).as("bytes"))
      .select(col("w.start").as("time_min"), col("files"), col("bytes"))
  }

  /** The full count report; `rtDir=None` leaves files/bytes null. */
  def run(records: DataFrame, rtDir: Option[String],
          intervalSeconds: Long = 3600): DataFrame = {
    val recs = recordBuckets(records, intervalSeconds)
    rtDir match {
      case Some(dir) =>
        recs.join(fileBuckets(records.sparkSession, dir, intervalSeconds),
          Seq("time_min"), "left")
      case None =>
        recs.withColumn("files", lit(null).cast("long"))
          .withColumn("bytes", lit(null).cast("long"))
    }
  }

  /** S8: the semicolon CSV sink. */
  def writeCsv(report: DataFrame, path: String): Unit =
    report.orderBy("time_min")
      .write.mode("overwrite").option("sep", ";").option("header", "true")
      .csv(path)
}
