package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.analyse.DelayAnalysis
import graft.gtfs.{GtfsStatic, RtIngest}

/** The engine's own domain, end to end, over the committed fixtures:
  * GTFS static + 40 realtime feeds → records → curve statistics →
  * predictions. These registry entries are rows-only for the driver (the
  * curve math has no SQL twin — its correctness is pinned by the
  * DelayAnalysis/Predictor specs against the pure-Scala CurveBuilder); they
  * exist so the full reference pipeline (SURVEY.md §3.1-§3.3) runs under
  * the driver's smoke/correctness harness too. */
object GtfsPipeline {

  private val fixtureDir = "/root/repo/fixtures"

  def records(s: SparkSession): DataFrame = {
    val schedule = GtfsStatic.read(s, s"$fixtureDir/gtfs_tiny")
    RtIngest.records(
      RtIngest.readFeeds(s, s"$fixtureDir/rt_tiny"), schedule,
      source = "rt_tiny", scheduleFileName = "gtfs_tiny")
  }

  val registry: Map[String, QueryDef] = Map(
    // §3.1 ingest: feeds -> records (J1/J2/F4/W2)
    "q40_gtfs_records" -> QueryDef(
      (s, _) => records(s)
        .select("route_id", "trip_id", "trip_start_date", "stop_sequence",
          "delay_arrival", "delay_departure")
        .orderBy("trip_start_date", "trip_id", "stop_sequence"),
      None),

    // §3.2 analyse: records -> stop-pair curve sets (W1+J3+A3/A6/A7)
    "q41_gtfs_curvesets" -> QueryDef(
      (s, _) => {
        val schedule = GtfsStatic.read(s, s"$fixtureDir/gtfs_tiny")
        val projected = DelayAnalysis.projectedRecords(records(s), schedule)
        DelayAnalysis.stopPairCurveSets(projected)
          .select(col("route_id"), col("route_variant"),
            col("start_stop_index"), col("end_stop_index"),
            col("time_slot_id"), col("event_type"), col("sample_size"),
            size(col("curves")).as("n_curves"))
          .orderBy("route_id", "route_variant", "start_stop_index",
            "end_stop_index", "time_slot_id", "event_type")
      },
      None),

    // §3.2+§3.3: records -> default curves -> scheduled predictions ladder
    "q42_gtfs_predictions" -> QueryDef(
      (s, _) => {
        val (schedule, preds) = fixturePredictions(s)
        preds
          .select(col("route_id"), col("trip_id"), col("trip_start_date"),
            col("stop_sequence"), col("event_type"), col("precision_type"),
            col("sample_size"), size(col("prediction_curve")).as("n_points"))
          .orderBy("trip_start_date", "trip_id", "stop_sequence", "event_type")
      },
      None),

    // monitor data layer over the same pipeline: departure board
    // (F5/F6/F7/J6/W4) under the driver smoke harness
    "q50_departure_board" -> QueryDef(
      (s, _) => {
        val (schedule, preds) = fixturePredictions(s)
        graft.monitor.Monitor.departureBoard(preds,
          schedule.trips, schedule.routes, schedule.stopTimes,
          stopIds = Seq("s1", "s2", "s3"),
          minTime = java.sql.Timestamp.valueOf("2024-03-15 00:00:00"),
          maxTime = java.sql.Timestamp.valueOf("2024-03-17 00:00:00"))
          .filter(col("event_type") === graft.model.EventType.Departure)
          .select(col("trip_id"), col("stop_id"), col("stop_sequence"),
            col("route_short_name"), col("precision_type"),
            round(col("median_delay"), 3).as("median_delay"))
      },
      None),

    // monitor transfer scoring (C9/C10/C11 + F8) over real pipeline curves
    "q51_transfer_scores" -> QueryDef(
      (s, _) => {
        val (_, preds) = fixturePredictions(s)
        val arrivals = preds
          .filter(col("event_type") === graft.model.EventType.Arrival &&
            col("stop_id") === "s2")
        val departures = preds
          .filter(col("event_type") === graft.model.EventType.Departure &&
            col("stop_id") === "s3")
        graft.monitor.Monitor.transfers(arrivals, departures,
            walkMeters = 120.0, minProbability = 0.0)
          .withColumn("transfer_probability",
            round(col("transfer_probability"), 4))
          .orderBy("arrival_trip", "departure_trip", "transfer_probability")
      },
      None))

  /** Shared tail of the fixture pipeline: records → curves → scheduled
    * predictions, built ONCE per JVM and checkpointed through the
    * FILESYSTEM — q42/q50/q51 then run as flat parquet scans. This is the
    * reference's own serving pattern (analyse once to disk, serve the
    * monitor many times — `src/main.rs:321-393` FileCache) and it is
    * robust where an in-session `.persist()` memo is not: the monitor
    * plans reference the prediction relation several times, and any cache
    * miss/eviction under the driver harness re-ran the entire
    * records→curves→ladder pipeline per reference (BENCH_r02: 57 s for an
    * 11-row board). A per-JVM temp dir (not a repo path) keeps the driver's
    * fresh-JVM verify/bench runs always building from current code. */
  @volatile private var predsPath: Option[String] = None

  private def fixturePredictions(s: SparkSession)
  : (GtfsStatic.Schedule, DataFrame) = synchronized {
    val schedule = GtfsStatic.read(s, s"$fixtureDir/gtfs_tiny")
    val path = predsPath.getOrElse {
      // records feeds vehicles + observations inside projectedRecords:
      // persist so the protobuf decode scan runs once, not per branch
      val recs = records(s).persist()
      val projected = DelayAnalysis.projectedRecords(recs, schedule).persist()
      val stats = graft.analyse.StatisticsIO.Statistics(
        DelayAnalysis.generalDelayCurves(projected),
        DelayAnalysis.stopPairCurveSets(projected),
        DelayAnalysis.defaultCurves(recs, schedule, schedule.routes))
      val preds = graft.predict.ScheduledPredictions.generate(s, schedule, stats,
        java.time.LocalDate.of(2024, 3, 15), days = 2)
      val dir = java.nio.file.Files.createTempDirectory("graft-fixture-preds")
        .resolve("predictions.parquet").toString
      preds.write.mode("overwrite").parquet(dir)
      recs.unpersist()
      projected.unpersist()
      predsPath = Some(dir)
      dir
    }
    (schedule, s.read.parquet(path))
  }
}
