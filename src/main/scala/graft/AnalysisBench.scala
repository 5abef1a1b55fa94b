package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throughput probe for the analyse pipeline itself (the fixture-based q41/
  * q42 only measure stage overhead): synthesizes records at a configurable
  * scale — vehicles x stops across many route variants — and times
  * gap-fill + general curves + stop-pair curve sets end to end.
  *
  * Run: SPARK_GRAFT_ROWS=1000000 sbt 'runMain graft.AnalysisBench'
  */
object AnalysisBench {
  def main(args: Array[String]): Unit = {
    val targetRows = sys.env.getOrElse("SPARK_GRAFT_ROWS", "1000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stopsPerTrip = 20
    val nVehicles = targetRows / stopsPerTrip
    // 200 variants x 20-stop trips; delays deterministic, weekday spread
    val records = spark.range(nVehicles)
      .select(
        lit("bench").as("source"),
        concat(lit("r"), (col("id") % 50).cast("string")).as("route_id"),
        (col("id") % 200).as("route_variant"),
        concat(lit("t"), (col("id") % 200).cast("string")).as("trip_id"),
        date_add(lit(java.sql.Date.valueOf("2024-01-01")),
          (col("id") % 360).cast("int")).as("trip_start_date"),
        (lit(6 * 3600) + (col("id") % 1440) * 60).cast("int").as("trip_start_time"),
        col("id"))
      .crossJoin(spark.range(stopsPerTrip).select(col("id").as("seq")))
      .select(col("source"), col("route_id"), col("route_variant"), col("trip_id"),
        col("trip_start_date"), col("trip_start_time"),
        (col("seq") + 1).cast("int").as("stop_sequence"),
        concat(lit("s"), col("seq")).as("stop_id"),
        timestamp_seconds(lit(1700000000L) + col("id")).as("time_of_recording"),
        when(col("seq") % 5 =!= 3, // 20% gaps exercise the forward fill
          ((col("id") + col("seq") * 7) % 240).cast("int") * 12 - 600).as("delay_arrival"),
        when(col("seq") % 5 =!= 3,
          ((col("id") + col("seq") * 11) % 240).cast("int") * 12 - 600).as("delay_departure"))

    // synthetic 20-stop schedule shared by all trips
    val tripIds = records.select("trip_id").distinct()
    val stopTimes = tripIds
      .crossJoin(spark.range(stopsPerTrip).select(col("id").as("seq")))
      .select(col("trip_id"),
        format_string("%02d:%02d:00",
          (lit(6) + col("seq") / 12).cast("int"), ((col("seq") % 12) * 5).cast("int")).as("arrival_time"),
        format_string("%02d:%02d:00",
          (lit(6) + col("seq") / 12).cast("int"), ((col("seq") % 12) * 5 + 1).cast("int")).as("departure_time"),
        concat(lit("s"), col("seq")).as("stop_id"),
        (col("seq") + 1).cast("int").as("stop_sequence"))
    val trips = tripIds.select(col("trip_id"),
      concat(lit("r"), (hash(col("trip_id")) % 50).cast("string")).as("route_id"),
      lit("svc").as("service_id"), lit("h").as("trip_headsign"), lit("sh").as("shape_id"))
    val schedule = graft.gtfs.GtfsStatic.Schedule(
      stops = spark.emptyDataFrame, routes = spark.emptyDataFrame,
      trips = trips, stopTimes = stopTimes,
      calendar = spark.emptyDataFrame, calendarDates = spark.emptyDataFrame)

    def time[T](name: String)(f: => T): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[analysis-bench] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    records.cache().count()
    val projected = graft.analyse.DelayAnalysis.projectedRecords(records, schedule)
    projected.cache()
    time(s"gap-fill projection ($targetRows rows)") { projected.count() }
    time("general delay curves") {
      graft.analyse.DelayAnalysis.generalDelayCurves(projected).count()
    }
    // attribution probes (r12): split the dominant stage — how much is
    // the vehicle self-join, how much the collect_list shuffle, how
    // much the group-local curve build (the UDF)
    val pairBase = graft.analyse.DelayAnalysis.stopPairRowsBase(projected)
    time("stop-pair rows (self-join only)") { pairBase.count() }
    time("stop-pair collect_list (join + agg, no curve build)") {
      pairBase
        .groupBy(col("route_id"), col("route_variant"),
          col("start_idx"), col("end_idx"), col("event_type"))
        .agg(collect_list(struct(col("time_slot_id"),
          col("start_delay"), col("end_delay"))).as("ps"))
        .select(sum(size(col("ps"))))
        .count()
    }
    // pure-Scala probe: one median-sized group's rows, rebuilt many
    // times driver-side — separates CurveBuilder cost from Spark-side
    // Row decoding / GC
    val oneGroup = pairBase
      .groupBy(col("route_id"), col("route_variant"),
        col("start_idx"), col("end_idx"), col("event_type"))
      .agg(collect_list(struct(col("time_slot_id"),
        col("start_delay"), col("end_delay"))).as("ps"))
      .select(col("ps")).limit(1).collect()(0)
      .getAs[scala.collection.Seq[org.apache.spark.sql.Row]](0)
      .map(r => (r.getInt(0), r.getFloat(1), r.getFloat(2))).toSeq
    println(s"[analysis-bench] sample group size: ${oneGroup.size}")
    time("driver: buildPairCurveSets x 2000") {
      var i = 0
      while (i < 2000) {
        graft.analyse.DelayAnalysis.buildPairCurveSets(oneGroup); i += 1
      }
    }
    // NOTE (r12): this probe is deliberately fed a LIST-typed Seq (the
    // .toSeq above builds one) — it found and now guards the curve
    // builder's collection-genericity: the pre-r12 makeCurve indexed
    // `sorted(i)`/`weights(i)` on the caller's Seq type, O(i) per
    // access on a List (measured 65.8 s for 2000 builds of this
    // 1738-row group; 1.1 s after the primitive-array rewrite).
    val onePairs = oneGroup.map(r => (r._2, r._3))
    time("driver: stopPairCurveSet(full group) x 2000") {
      var i = 0
      while (i < 2000) {
        graft.curves.CurveBuilder.stopPairCurveSet(onePairs); i += 1
      }
    }
    time("stop-pair curve sets") {
      graft.analyse.DelayAnalysis.stopPairCurveSets(projected).count()
    }
    val routes = records.select("route_id").distinct()
      .withColumn("route_type", lit(3))
    time("default curve cascade") {
      graft.analyse.DelayAnalysis.defaultCurves(records, schedule, routes).count()
    }
    spark.stop()
  }
}
