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
        val schedule = GtfsStatic.read(s, s"$fixtureDir/gtfs_tiny")
        // records feeds vehicles + observations inside projectedRecords:
        // persist so the protobuf decode scan runs once, not per branch
        val recs = records(s).persist()
        val projected = DelayAnalysis.projectedRecords(recs, schedule).persist()
        val stats = graft.analyse.StatisticsIO.Statistics(
          DelayAnalysis.generalDelayCurves(projected),
          DelayAnalysis.stopPairCurveSets(projected),
          DelayAnalysis.defaultCurves(recs, schedule, schedule.routes))
        graft.predict.ScheduledPredictions.generate(s, schedule, stats,
          java.time.LocalDate.of(2024, 3, 15), days = 2)
          .select(col("route_id"), col("trip_id"), col("trip_start_date"),
            col("stop_sequence"), col("event_type"), col("precision_type"),
            col("sample_size"), size(col("prediction_curve")).as("n_points"))
          .orderBy("trip_start_date", "trip_id", "stop_sequence", "event_type")
      },
      None))
}
