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

  /** The RtFixtureGen arithmetic as a DuckDB CTE: i = 0..39 weekday
    * mornings from 2024-03-04, tA1 delays 12i / 12i+24 / 12i+48 at stop
    * sequences 1/2/4 (stop 3 absent — the W1 gap), tB2 every 5th day.
    * The GOLDEN side of the q40/q53 oracles: the generator spec is the
    * ground truth the whole decode→match→ingest pipeline must reproduce. */
  private val goldenRecordsCte =
    """days AS (SELECT i, DATE '2024-03-04' + INTERVAL ((i//5)*7 + (i%5)) DAY AS d
      |  FROM (SELECT unnest(range(40)) AS i)),
      |recs AS (
      |  SELECT 'rA' AS route_id, 'tA1' AS trip_id, d AS trip_start_date, 1 AS stop_sequence,
      |         CAST(NULL AS INTEGER) AS delay_arrival, CAST(12*i AS INTEGER) AS delay_departure FROM days
      |  UNION ALL SELECT 'rA','tA1',d,2,12*i+24,12*i+24 FROM days
      |  UNION ALL SELECT 'rA','tA1',d,4,12*i+48,NULL FROM days
      |  UNION ALL SELECT 'rB','tB2',d,2,30+i,35+i FROM days WHERE i%5=0)""".stripMargin

  private def slotCaseSql(ts: String): String =
    graft.model.TimeSlot.duckDbCaseSql(ts)

  val registry: Map[String, QueryDef] = Map(
    // §3.1 ingest: feeds -> records (J1/J2/F4/W2). Oracle: the pipeline
    // output must equal the feed GENERATOR's arithmetic — a golden
    // end-to-end check of protobuf decode + schedule join + ghost-trip
    // drop + dedup, in pure SQL.
    "q40_gtfs_records" -> QueryDef(
      (s, _) => fixtureRecords(s)
        .select("route_id", "trip_id", "trip_start_date", "stop_sequence",
          "delay_arrival", "delay_departure")
        .orderBy("trip_start_date", "trip_id", "stop_sequence"),
      Some(s"""WITH $goldenRecordsCte
             |SELECT * FROM recs
             |ORDER BY trip_start_date, trip_id, stop_sequence""".stripMargin)),

    // §3.2 analyse: records -> stop-pair curve sets (W1+J3+A3/A6/A7);
    // rows-only (adaptive-marker sample_size and curve contents have no
    // SQL twin — GoldenParitySpec pins them; q53 hash-checks the pair
    // stream underneath)
    "q41_gtfs_curvesets" -> QueryDef(
      (s, _) => {
        DelayAnalysis.stopPairCurveSets(fixtureProjected(s))
          .select(col("route_id"), col("route_variant"),
            col("start_stop_index"), col("end_stop_index"),
            col("time_slot_id"), col("event_type"), col("sample_size"),
            size(col("curves")).as("n_curves"))
          .orderBy("route_id", "route_variant", "start_stop_index",
            "end_stop_index", "time_slot_id", "event_type")
      },
      None),

    // the pair-row stream under q41, aggregated to SQL-checkable facts:
    // per (pair, slot, event) group the row count and EXACT integer sums
    // of the rounded start/end delays — verifying W1 gap-fill, F2
    // threshold, F3 rounding, C5 slot assignment, Default-slot
    // duplication and the F9 >20 gate against a DuckDB reimplementation
    // joined to the golden feed arithmetic.
    "q53_gtfs_pair_stats" -> QueryDef(
      (s, _) => {
        DelayAnalysis.stopPairRows(fixtureProjected(s))
          .groupBy(col("route_id"),
            col("start_idx").as("start_stop_index"),
            col("end_idx").as("end_stop_index"),
            col("time_slot_id"), col("event_type"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(col("start_delay").cast("long")).as("sum_start_delay"),
            sum(col("end_delay").cast("long")).as("sum_end_delay"))
          .filter(col("n_pairs") > 20)
          .orderBy("route_id", "start_stop_index", "end_stop_index",
            "time_slot_id", "event_type")
      },
      Some(s"""WITH $goldenRecordsCte,
             |st AS (SELECT trip_id, CAST(stop_sequence AS INT) AS stop_sequence,
             |    ROW_NUMBER() OVER (PARTITION BY trip_id ORDER BY CAST(stop_sequence AS INT)) - 1 AS stop_index,
             |    CAST(split_part(arrival_time,':',1) AS INT)*3600 + CAST(split_part(arrival_time,':',2) AS INT)*60
             |      + CAST(split_part(arrival_time,':',3) AS INT) AS arr_secs,
             |    CAST(split_part(departure_time,':',1) AS INT)*3600 + CAST(split_part(departure_time,':',2) AS INT)*60
             |      + CAST(split_part(departure_time,':',3) AS INT) AS dep_secs
             |  FROM read_csv_auto('$fixtureDir/gtfs_tiny/stop_times.txt', header=true)),
             |vehicles AS (SELECT DISTINCT trip_id, trip_start_date FROM recs),
             |filled AS (SELECT g.trip_id, g.trip_start_date, s.stop_index,
             |    last_value(r.delay_arrival IGNORE NULLS) OVER w AS da,
             |    last_value(r.delay_departure IGNORE NULLS) OVER w AS dd,
             |    CAST(g.trip_start_date AS TIMESTAMP) + INTERVAL (s.dep_secs) SECOND AS dep_instant
             |  FROM (SELECT v.trip_id, v.trip_start_date FROM vehicles v) g
             |  JOIN st s ON s.trip_id = g.trip_id
             |  LEFT JOIN recs r ON r.trip_id = g.trip_id AND r.trip_start_date = g.trip_start_date
             |    AND r.stop_sequence = s.stop_sequence
             |  WINDOW w AS (PARTITION BY g.trip_id, g.trip_start_date ORDER BY s.stop_index
             |               ROWS UNBOUNDED PRECEDING)),
             |starts AS (SELECT trip_id, trip_start_date, stop_index AS start_idx,
             |    (dd//12)*12 AS start_delay, ${slotCaseSql("dep_instant")} AS slot
             |  FROM filled WHERE dd IS NOT NULL AND abs(dd) < 3000),
             |ends AS (
             |  SELECT trip_id, trip_start_date, stop_index AS end_idx, 1 AS event_type,
             |    (da//12)*12 AS end_delay FROM filled WHERE da IS NOT NULL AND abs(da) < 3000
             |  UNION ALL SELECT trip_id, trip_start_date, stop_index, 2,
             |    (dd//12)*12 FROM filled WHERE dd IS NOT NULL AND abs(dd) < 3000),
             |pairs AS (
             |  SELECT t.route_id, s.start_idx, e.end_idx, sl.slot AS time_slot_id,
             |    e.event_type, s.start_delay, e.end_delay
             |  FROM starts s
             |  JOIN ends e ON e.trip_id = s.trip_id AND e.trip_start_date = s.trip_start_date
             |    AND e.end_idx > s.start_idx
             |  JOIN read_csv_auto('$fixtureDir/gtfs_tiny/trips.txt', header=true) t
             |    ON t.trip_id = s.trip_id,
             |  LATERAL (SELECT unnest([s.slot, ${graft.model.TimeSlot.Default.id}]) AS slot) sl)
             |SELECT route_id, start_idx AS start_stop_index, end_idx AS end_stop_index,
             |  time_slot_id, event_type, COUNT(*) AS n_pairs,
             |  CAST(SUM(start_delay) AS BIGINT) AS sum_start_delay,
             |  CAST(SUM(end_delay) AS BIGINT) AS sum_end_delay
             |FROM pairs GROUP BY 1,2,3,4,5 HAVING COUNT(*) > 20
             |ORDER BY 1,2,3,4,5""".stripMargin)),

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

    // §3.3 scheduled-prediction REQUEST generation over a horizon that
    // crosses a weekend AND the 2024-03-18 calendar exception (wk removed,
    // we added) — hash-checks tripsForDate (weekday bits, date ranges,
    // calendar_dates add/remove), the single trip_start_time identity
    // (first stop's departure), dense stop_index/stop_count, and >24h
    // event instants against a DuckDB reimplementation over the GTFS CSVs.
    "q55_gtfs_requests" -> QueryDef(
      (s, _) => {
        graft.predict.ScheduledPredictions.requests(s, fixtureSchedule(s),
            java.time.LocalDate.of(2024, 3, 15), days = 4)
          .select(col("route_id"), col("trip_id"), col("trip_start_date"),
            col("trip_start_time"), col("stop_sequence"), col("stop_id"),
            col("stop_index"), col("stop_count"), col("event_type"),
            col("event_instant"))
          .orderBy("trip_start_date", "trip_id", "stop_sequence", "event_type")
      },
      Some(s"""WITH days AS (SELECT unnest([DATE '2024-03-15', DATE '2024-03-16',
             |    DATE '2024-03-17', DATE '2024-03-18']) AS d),
             |cal AS (SELECT * FROM read_csv_auto('$fixtureDir/gtfs_tiny/calendar.txt', header=true)),
             |cd AS (SELECT * FROM read_csv_auto('$fixtureDir/gtfs_tiny/calendar_dates.txt', header=true)),
             |svc AS (
             |  SELECT d, service_id FROM days, cal
             |  WHERE CASE isodow(d) WHEN 1 THEN monday WHEN 2 THEN tuesday
             |      WHEN 3 THEN wednesday WHEN 4 THEN thursday WHEN 5 THEN friday
             |      WHEN 6 THEN saturday ELSE sunday END = 1
             |    AND start_date <= CAST(strftime(d, '%Y%m%d') AS INT)
             |    AND end_date >= CAST(strftime(d, '%Y%m%d') AS INT)
             |  UNION
             |  SELECT d, service_id FROM days JOIN cd
             |    ON cd.date = CAST(strftime(d, '%Y%m%d') AS INT) AND cd.exception_type = 1),
             |active AS (SELECT * FROM svc s WHERE NOT EXISTS (
             |  SELECT 1 FROM cd WHERE cd.service_id = s.service_id
             |    AND cd.date = CAST(strftime(s.d, '%Y%m%d') AS INT) AND cd.exception_type = 2)),
             |st AS (SELECT trip_id, CAST(stop_sequence AS INT) AS stop_sequence, stop_id,
             |    ROW_NUMBER() OVER (PARTITION BY trip_id ORDER BY CAST(stop_sequence AS INT)) - 1 AS stop_index,
             |    CAST(COUNT(*) OVER (PARTITION BY trip_id) AS INT) AS stop_count,
             |    CAST(split_part(arrival_time,':',1) AS INT)*3600 + CAST(split_part(arrival_time,':',2) AS INT)*60
             |      + CAST(split_part(arrival_time,':',3) AS INT) AS arr_secs,
             |    CAST(split_part(departure_time,':',1) AS INT)*3600 + CAST(split_part(departure_time,':',2) AS INT)*60
             |      + CAST(split_part(departure_time,':',3) AS INT) AS dep_secs
             |  FROM read_csv_auto('$fixtureDir/gtfs_tiny/stop_times.txt', header=true)),
             |runs AS (
             |  SELECT t.route_id, t.trip_id, a.d AS trip_start_date, st.*
             |  FROM active a
             |  JOIN read_csv_auto('$fixtureDir/gtfs_tiny/trips.txt', header=true) t
             |    ON t.service_id = a.service_id
             |  JOIN st ON st.trip_id = t.trip_id),
             |named AS (SELECT *, first_value(dep_secs) OVER
             |    (PARTITION BY trip_id, trip_start_date ORDER BY stop_index) AS trip_start_time
             |  FROM runs)
             |SELECT route_id, trip_id, trip_start_date, trip_start_time, stop_sequence,
             |  stop_id, stop_index, stop_count, event_type,
             |  CAST(trip_start_date AS TIMESTAMP) + INTERVAL (secs) SECOND AS event_instant
             |FROM named, LATERAL (SELECT unnest([1, 2]) AS event_type,
             |  unnest([arr_secs, dep_secs]) AS secs) e
             |ORDER BY trip_start_date, trip_id, stop_sequence, event_type""".stripMargin)),

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

    // monitor transfer scoring (C9/C10/C11 + F8) over real pipeline
    // curves, through the KEYED fleet-scale shape (stop-pair equi-join +
    // time band, no cartesian product); the band spans the whole 2-day
    // fixture so the output equals the single-board cross join
    // (MonitorSpec pins banded == cartesian)
    "q51_transfer_scores" -> QueryDef(
      (s, _) => {
        import s.implicits._
        val (_, preds) = fixturePredictions(s)
        val arrivals = preds
          .filter(col("event_type") === graft.model.EventType.Arrival)
        val departures = preds
          .filter(col("event_type") === graft.model.EventType.Departure)
        val stopPairs = Seq(("s2", "s3", 120.0))
          .toDF("arrival_stop", "departure_stop", "walk_meters")
        graft.monitor.Monitor.transfersBanded(arrivals, departures, stopPairs,
            horizonSecs = 3 * 86400, slackSecs = 3 * 86400,
            minProbability = 0.0)
          .withColumn("transfer_probability",
            round(col("transfer_probability"), 4))
          .orderBy("arrival_trip", "departure_trip", "transfer_probability")
      },
      None))

  /** Stages of the fixture pipeline (records → projections → predictions),
    * each built ONCE per JVM and checkpointed through the FILESYSTEM —
    * every registry query above then runs as a flat parquet scan. This is
    * the reference's own serving pattern (analyse once to disk, serve the
    * monitor many times — `src/main.rs:321-393` FileCache) and it is
    * robust where an in-session `.persist()` memo is not: the monitor
    * plans reference the prediction relation several times, and any cache
    * miss/eviction under the driver harness re-ran the entire
    * records→curves→ladder pipeline per reference (BENCH_r02: 57 s for an
    * 11-row board). A per-JVM temp dir (not a repo path) keeps the driver's
    * fresh-JVM verify/bench runs always building from current code. */
  private val stagePaths = scala.collection.mutable.Map.empty[String, String]

  // reentrant lock: a stage's build may itself request earlier stages
  // (projected -> records), which re-enters cleanly
  private def checkpointed(s: SparkSession, stage: String)
                          (build: => DataFrame): DataFrame = {
    val path = synchronized {
      stagePaths.getOrElseUpdate(stage, {
        val dir = java.nio.file.Files.createTempDirectory(s"graft-fixture-$stage")
          .resolve(s"$stage.parquet").toString
        build.write.mode("overwrite").parquet(dir)
        dir
      })
    }
    s.read.parquet(path)
  }

  private def fixtureSchedule(s: SparkSession): GtfsStatic.Schedule =
    GtfsStatic.read(s, s"$fixtureDir/gtfs_tiny")

  private def fixtureRecords(s: SparkSession): DataFrame =
    checkpointed(s, "records")(records(s))

  /** Spec access (GtfsGoldenPinSpec pins curve bytes). */
  private[operators] def fixtureProjectedForSpec(s: SparkSession): DataFrame =
    fixtureProjected(s)

  /** Spec access (GtfsGoldenPinSpec pins prediction curve bytes). */
  private[operators] def fixturePredictionsForSpec(s: SparkSession)
  : (GtfsStatic.Schedule, DataFrame) = fixturePredictions(s)

  private def fixtureProjected(s: SparkSession): DataFrame =
    checkpointed(s, "projected") {
      DelayAnalysis.projectedRecords(fixtureRecords(s), fixtureSchedule(s))
    }

  private def fixturePredictions(s: SparkSession)
  : (GtfsStatic.Schedule, DataFrame) = {
    val schedule = fixtureSchedule(s)
    val preds = checkpointed(s, "predictions") {
      val recs = fixtureRecords(s)       // flat scan: decode ran once
      val projected = fixtureProjected(s) // flat scan: gap-fill ran once
      val stats = graft.analyse.StatisticsIO.Statistics(
        DelayAnalysis.generalDelayCurves(projected),
        DelayAnalysis.stopPairCurveSets(projected),
        DelayAnalysis.defaultCurves(recs, schedule, schedule.routes))
      graft.predict.ScheduledPredictions.generate(s, schedule, stats,
        java.time.LocalDate.of(2024, 3, 15), days = 2)
    }
    (schedule, preds)
  }
}
