package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.gtfs.{GtfsRt, GtfsStatic}

/** Micro-batch latency probe for the COMPLETE automatic mode (§3.1/§3.3:
  * feed directory → decode → records upsert, plus vehicle updates →
  * stateful basis dedup → realtime ladder → predictions upsert) — the
  * streaming counterpart of Bench. The reference polls its feed directory
  * every 5 s (`/root/reference/src/importer/mod.rs:30`); the question at
  * fleet scale is whether a trigger interval's work completes INSIDE the
  * interval (sustained) or falls behind (ever-growing backlog).
  *
  * Synthesizes a fleet-sized GTFS schedule + statistics, pre-stages
  * `SPARK_GRAFT_FEEDS` protobuf feeds of `SPARK_GRAFT_VEHICLES` trip
  * updates each, then drips one more feed per trigger interval while both
  * queries run. Prints ONE JSON line with per-query batch-duration
  * percentiles, throughput, and the basis-dedup state size (which must
  * stay == fleet size — bounded — regardless of feeds processed).
  *
  * `SPARK_GRAFT_COMPOSED=1` (r9 verdict task #4) co-residents the THREE
  * streamed index sinks (BM25, prefix-dedup, sign-LSH ANN — each with
  * its auto-compaction cadence) in the SAME SparkSession: rate-source
  * document/vector feeds drive them at the same trigger while the
  * records + predictions queries process the fleet. The question is
  * INTERFERENCE — whether the automatic mode's batch medians stay under
  * the trigger floor with five queries sharing one scheduler — so the
  * JSON line grows per-sink batch percentiles alongside the two
  * automatic-mode entries.
  *
  * Dev tooling (scale probes), not part of the driver contract.
  */
object StreamBench {

  private def pct(xs: Seq[Long], p: Double): Long =
    if (xs.isEmpty) -1L
    else xs.sorted.apply(math.min(xs.size - 1, (p * xs.size).toInt))

  def main(args: Array[String]): Unit = {
    val vehicles = sys.env.getOrElse("SPARK_GRAFT_VEHICLES", "2000").toInt
    val staged = sys.env.getOrElse("SPARK_GRAFT_FEEDS", "10").toInt
    val dripped = sys.env.getOrElse("SPARK_GRAFT_DRIP", "10").toInt
    val triggerMs = sys.env.getOrElse("SPARK_GRAFT_TRIGGER_MS", "2000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // FAIR scheduling with two pools (r10 verdict task #1): the
    // automatic mode's predictions are a LATENCY SLO (the reference's
    // 5 s floor); the index sinks are THROUGHPUT work. Under default
    // FIFO a long prefix-probe job walls every prediction job queued
    // behind it — the saturation's transmission path into the floor.
    // Pools cap the damage: latency-pool jobs get slots ahead of bulk
    // maintenance (weight 4 + a minShare half the cores), which is
    // exactly how a production composed session should be laid out.
    val poolsXml = java.nio.file.Files.createTempFile("graft-pools", ".xml")
    java.nio.file.Files.writeString(poolsXml,
      s"""<?xml version="1.0"?>
         |<allocations>
         |  <pool name="latency">
         |    <schedulingMode>FAIR</schedulingMode>
         |    <weight>32</weight><minShare>${cpus.toInt}</minShare>
         |  </pool>
         |  <pool name="bulk">
         |    <schedulingMode>FAIR</schedulingMode>
         |    <weight>1</weight><minShare>0</minShare>
         |  </pool>
         |</allocations>""".stripMargin)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.scheduler.allocation.file", poolsXml.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val stopsPerTrip = 20
    val base = java.nio.file.Files.createTempDirectory("graft-streambench")
    val rtDir = base.resolve("feeds").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(rtDir))

    // --- fleet-sized synthetic schedule (in-memory DataFrames) ---
    val tripIds = spark.range(vehicles)
      .select(concat(lit("t"), col("id")).as("trip_id"), col("id"))
    val trips = tripIds.select(col("trip_id"),
      concat(lit("r"), col("id") % 50).as("route_id"),
      lit("daily").as("service_id"), lit(null).cast("string").as("trip_headsign"),
      lit(null).cast("string").as("shape_id"))
    val stopTimes = tripIds
      .crossJoin(spark.range(stopsPerTrip).select(col("id").as("seq")))
      .select(col("trip_id"),
        format_string("%02d:%02d:00", (lit(6) + col("seq") / 12).cast("int"),
          ((col("seq") % 12) * 5).cast("int")).as("arrival_time"),
        format_string("%02d:%02d:00", (lit(6) + col("seq") / 12).cast("int"),
          ((col("seq") % 12) * 5 + 1).cast("int")).as("departure_time"),
        // 100 shared physical stops; 50 route shapes -> 50 variants
        concat(lit("s"), (col("id") % 50) * stopsPerTrip + col("seq")).as("stop_id"),
        (col("seq") + 1).cast("int").as("stop_sequence"))
    val routes = spark.range(50).select(
      concat(lit("r"), col("id")).as("route_id"), lit(null).cast("string").as("agency_id"),
      concat(lit("R"), col("id")).as("route_short_name"), lit(3).cast("int").as("route_type"))
    val stops = stopTimes.select(col("stop_id")).distinct()
      .select(col("stop_id"), col("stop_id").as("stop_name"),
        lit(53.0).as("stop_lat"), lit(8.8).as("stop_lon"))
    def emptyDf(schema: org.apache.spark.sql.types.StructType): DataFrame =
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val schedule = GtfsStatic.Schedule(stops, routes, trips, stopTimes,
      emptyDf(GtfsStatic.calendarSchema), emptyDf(GtfsStatic.calendarDatesSchema))

    // --- statistics: default grid from one synthetic service day of
    // records (the realtime ladder then resolves every request through
    // the General/FallbackGeneral cells — the hot path at fleet scale) ---
    val day = java.sql.Date.valueOf("2024-03-15")
    val records = schedule.tripsWithVariant.select("trip_id", "route_id", "route_variant")
      .crossJoin(spark.range(stopsPerTrip).select(col("id").as("seq")))
      .select(lit("bench").as("source"), col("route_id"), col("route_variant"),
        col("trip_id"), lit(day).as("trip_start_date"),
        lit(6 * 3600).cast("int").as("trip_start_time"),
        (col("seq") + 1).cast("int").as("stop_sequence"),
        ((abs(hash(col("trip_id"), col("seq"))) % 240) * 12 - 600).cast("int").as("delay_arrival"),
        ((abs(hash(col("seq"), col("trip_id"))) % 240) * 12 - 600).cast("int").as("delay_departure"))
    val stats = graft.analyse.StatisticsIO.Statistics(
      Seq.empty[graft.analyse.GeneralCurveRow].toDF(),
      Seq.empty[graft.analyse.CurveSetRow].toDF(),
      graft.analyse.DelayAnalysis.defaultCurves(records, schedule, routes).cache())
    stats.defaults.count() // materialize before the clock starts

    // --- feed generator: every vehicle reports once per feed, basis
    // (stop, delay) changes each feed -> full prediction-work volume ---
    def writeFeed(j: Int): Unit = {
      val ts = 1710489600L + j * (triggerMs / 1000)
      def ev(d: Int) = Some(GtfsRt.StopTimeEvent(Some(d), None))
      val updates = (0 until vehicles).map { v =>
        val seq = 1 + ((j + v) % stopsPerTrip)
        val delay = ((v * 7 + j * 13) % 240) * 12 - 600
        GtfsRt.TripUpdate(
          GtfsRt.TripDescriptor(Some(s"t$v"), Some(s"r${v % 50}"),
            startTime = Some("06:00:00"), startDate = Some("20240315")),
          Seq(GtfsRt.StopTimeUpdate(Some(seq), None, ev(delay), ev(delay))))
      }
      val bytes = GtfsRt.encode(GtfsRt.FeedMessage(Some(ts), updates))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(rtDir, f"feed_$j%04d.pb"), bytes)
    }
    (0 until staged).foreach(writeFeed)

    val trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(triggerMs)
    val composed = sys.env.get("SPARK_GRAFT_COMPOSED").contains("1")

    // --- composed mode: the three index-maintenance sinks co-resident
    // in this session, fed by rate sources at the same trigger ---
    val ixQueries: Seq[(String, org.apache.spark.sql.streaming.StreamingQuery)] =
      if (!composed) Nil else {
        import graft.streaming.{AnnStream, DocStream}
        val docsPerSec = sys.env.getOrElse("SPARK_GRAFT_DOC_RATE", "200").toInt
        val vecsPerSec = sys.env.getOrElse("SPARK_GRAFT_VEC_RATE", "500").toInt
        // rate-micro-batch = the Kafka maxOffsetsPerTrigger discipline:
        // EXACTLY rate×trigger rows per batch. The plain rate source
        // "catches up" after any slow batch by emitting the whole
        // backlog into the next one, so a single JIT-cold first batch
        // snowballs into ever-growing batches and the measurement
        // conflates warmup with saturation (r10's table measured that
        // snowball). A deployment ALWAYS bounds per-trigger intake to
        // protect its latency SLO; keeping up is then falsifiable per
        // batch: steady-state batch time must stay under the trigger —
        // reported below, not hidden.
        val sinkTriggerMs = sys.env.getOrElse("SPARK_GRAFT_SINK_TRIGGER_MS",
          (triggerMs * 3).toString).toLong
        def rate(rps: Int, trigMs: Long) = spark.readStream
          .format("rate-micro-batch")
          .option("rowsPerBatch", (rps * trigMs / 1000).toInt)
          .option("advanceMillisPerBatch", trigMs.toString).load()
        val bm25Path = base.resolve("bm25ix").toString
        val prefixPath = base.resolve("prefixix").toString
        val annPath = base.resolve("annix").toString
        // prefix/ANN stores need a base; base ids (1e9+) sit ABOVE the
        // rate-source ids (0..), keeping the namespaces disjoint
        DocStream.initPrefixIndexStore(
          spark.range(1000000000L, 1000002000L)
            .select(col("id").as("doc_id"),
              BenchCorpus.zipfText(col("id")).as("text")),
          prefixPath, 0.5)
        AnnStream.initAnnIndexStore(
          spark.range(1000000000L, 1000005000L).toDF("id").select(
            col("id").as("vec_id"),
            transform(sequence(lit(0), lit(15)), d =>
              ((pmod(xxhash64(col("id"), d), lit(2001L)).cast("double")
                / 1000.0) - 1.0).cast("float")).as("embedding")),
          annPath)
        def docFeed(trigMs: Long) = rate(docsPerSec, trigMs)
          .select(col("value").as("doc_id"),
            BenchCorpus.zipfText(col("value")).as("text"))
        def vecFeed(trigMs: Long) = rate(vecsPerSec, trigMs)
          .select(col("value").as("vec_id"),
            transform(sequence(lit(0), lit(15)), d =>
              ((pmod(xxhash64(col("value"), d, lit(3L)), lit(2001L))
                .cast("double") / 1000.0) - 1.0).cast("float")).as("embedding"))
        // the sinks are throughput work with NO latency floor of their
        // own — a deployment runs them at a coarser trigger than the
        // automatic mode's 5 s SLO (amortizes the per-batch fixed cost
        // over more rows and cuts their scheduler pressure during
        // prediction triggers). The three triggers are mutually
        // CO-PRIME multiples around SPARK_GRAFT_SINK_TRIGGER_MS
        // (ProcessingTime aligns to epoch multiples, so equal triggers
        // fire as a thundering herd into the same prediction windows;
        // co-prime periods spread the collisions).
        def go(name: String, df: DataFrame, trigMs: Long,
               sink: (DataFrame, Long) => Unit) = {
          // a streaming query's jobs inherit the local properties of
          // the thread that STARTS it — classify the maintenance sinks
          // into the bulk pool here
          spark.sparkContext.setLocalProperty("spark.scheduler.pool", "bulk")
          val q = df.writeStream
            .trigger(org.apache.spark.sql.streaming.Trigger
              .ProcessingTime(trigMs))
            .option("checkpointLocation", base.resolve(s"ckpt-$name").toString)
            .foreachBatch(sink).start()
          spark.sparkContext.setLocalProperty("spark.scheduler.pool", null)
          name -> q
        }
        val (tBm, tPre, tAnn) =
          (sinkTriggerMs * 13 / 15, sinkTriggerMs * 17 / 15,
            sinkTriggerMs * 11 / 15)
        Seq(
          go("bm25_sink", docFeed(tBm), tBm,
            DocStream.bm25IndexSink(bm25Path, autoCompactEvery = 10)),
          go("prefix_sink", docFeed(tPre), tPre,
            DocStream.prefixIndexSink(prefixPath, 0.5, autoCompactEvery = 10)),
          go("ann_sink", vecFeed(tAnn), tAnn,
            AnnStream.annIndexSink(annPath, autoCompactEvery = 10)))
      }

    val t0 = System.nanoTime()
    // the automatic mode (records + predictions) is the latency SLO
    spark.sparkContext.setLocalProperty("spark.scheduler.pool", "latency")
    val (recQ, predQ) = graft.streaming.RtStream.startAutomatic(spark, rtDir,
      schedule, stats,
      recordsPath = base.resolve("records").toString,
      predictionsPath = base.resolve("predictions").toString,
      checkpointBase = base.resolve("ckpt").toString,
      trigger = trigger,
      // ttl 0: ProcessingTimeTimeout schedules continuous empty batches,
      // which keeps processAllAvailable below from ever draining (see
      // dedupPredictionWork's note); state-bound evidence is unaffected
      basisTtlMs = 0L,
      // probe time anchors to the synthetic service day (F10 gates trips
      // started >12 h before `now` — wall-clock would drop everything)
      now = () => java.sql.Timestamp.valueOf("2024-03-15 07:00:00"))
    spark.sparkContext.setLocalProperty("spark.scheduler.pool", null)
    // drip one feed per trigger interval on top of the staged backlog
    (staged until staged + dripped).foreach { j =>
      writeFeed(j); Thread.sleep(triggerMs)
    }
    recQ.processAllAvailable()
    predQ.processAllAvailable()
    val wallS = (System.nanoTime() - t0) / 1e9
    def summary(q: org.apache.spark.sql.streaming.StreamingQuery) = {
      val ps = q.recentProgress.toSeq.filter(_.numInputRows > 0)
      val durs = ps.map(_.durationMs.get("triggerExecution").longValue())
      val rows = ps.map(_.numInputRows).sum
      val state = ps.flatMap(_.stateOperators.toSeq.map(_.numRowsTotal))
        .lastOption.getOrElse(-1L)
      (ps.size, rows, durs, state)
    }
    val (rb, rRows, rDurs, _) = summary(recQ)
    val (pb, pRows, pDurs, pState) = summary(predQ)
    val ixSummaries = ixQueries.map { case (name, q) =>
      val (b, rows, durs, _) = summary(q)
      (name, b, rows, durs)
    }
    ixQueries.foreach(_._2.stop())
    recQ.stop(); predQ.stop()
    val nPreds = spark.read.parquet(base.resolve("predictions").toString).count()
    val ixJson = ixSummaries.map { case (name, b, rows, durs) =>
      s""","$name":{"batches":$b,"rows":$rows,"batch_ms_median":${pct(durs, 0.5)},"batch_ms_p95":${pct(durs, 0.95)},"batch_ms_max":${pct(durs, 1.0)}}"""
    }.mkString
    println(s"""{"metric":"stream_latency","vehicles":$vehicles,"feeds":${staged + dripped},"trigger_ms":$triggerMs,"composed":$composed,"wall_s":$wallS,""" +
      s""""records":{"batches":$rb,"rows":$rRows,"batch_ms_median":${pct(rDurs, 0.5)},"batch_ms_p95":${pct(rDurs, 0.95)},"batch_ms_max":${pct(rDurs, 1.0)}},""" +
      s""""predictions":{"batches":$pb,"rows":$pRows,"batch_ms_median":${pct(pDurs, 0.5)},"batch_ms_p95":${pct(pDurs, 0.95)},"batch_ms_max":${pct(pDurs, 1.0)},"state_rows":$pState,"pred_rows_written":$nPreds}$ixJson}""")
    spark.stop()
  }
}
