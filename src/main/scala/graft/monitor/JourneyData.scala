package graft.monitor

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.gtfs.GtfsStatic
import graft.model.GtfsTime

/** Journey-page lookups (reference `src/monitor/journey_data.rs` and
  * visual-schedule helpers — SURVEY.md J8, F12, W8, C17). */
object JourneyData {

  /** F12: stop-name autocomplete — every lowercase term contained in the
    * name, first 10 by name (reference `src/monitor/mod.rs:198-215`). */
  def searchStops(stops: DataFrame, query: String, limit: Int = 10): DataFrame = {
    val terms = query.toLowerCase.split("\\s+").filter(_.nonEmpty)
    val pred = terms.map(t => lower(col("stop_name")).contains(t))
      .reduceOption(_ && _).getOrElse(lit(true))
    stops.filter(pred)
      .select("stop_id", "stop_name")
      .orderBy("stop_name").limit(limit)
  }

  /** J8: resolve a trip from journey-link attributes — (headsign, route
    * short name, route type, departure time at a named stop, service date
    * within ±1 day) (reference `src/monitor/journey_data.rs:382-473`).
    * The ±1-day widening handles trips whose >24h stop times put the
    * service day before the calendar date. */
  def resolveTrip(spark: SparkSession, schedule: GtfsStatic.Schedule,
                  headsign: String, routeShortName: String, routeType: Int,
                  stopId: String, departureSecsOfDay: Int,
                  date: java.time.LocalDate): DataFrame = {
    val candidateDays = Seq(-1, 0, 1).map(date.plusDays(_))
    val active = candidateDays.map { day =>
      GtfsStatic.tripsForDate(schedule, day)
        .withColumn("service_day", lit(java.sql.Date.valueOf(day)))
    }.reduce(_ unionByName _)
    active
      .filter(col("trip_headsign") === headsign)
      .join(broadcast(schedule.routes.filter(
        col("route_short_name") === routeShortName && col("route_type") === routeType)
        .select("route_id")), Seq("route_id"))
      .join(schedule.stopTimes.filter(col("stop_id") === stopId)
        .withColumn("dep_secs", GtfsTime.timeToSecondsColumn(col("departure_time")))
        .select("trip_id", "stop_sequence", "dep_secs"), Seq("trip_id"))
      // match the absolute instant: service day + seconds may hit the target
      // with dep_secs or dep_secs±86400 on the neighbouring service day
      .filter(col("dep_secs") % 86400 === departureSecsOfDay % 86400)
      .select("trip_id", "route_id", "service_day", "stop_sequence", "dep_secs")
  }

  /** C17: is `inner` a contiguous stop-id sub-sequence of `outer`, forward
    * or reversed (reference `src/analyser/visual_schedule.rs:243-248,
    * 271-277`)? */
  def isSubTrip(outer: Seq[String], inner: Seq[String]): Boolean = {
    def contains(o: Seq[String], i: Seq[String]) =
      i.nonEmpty && o.sliding(i.length).contains(i)
    contains(outer, inner) || contains(outer.reverse, inner)
  }

  /** W8: the visual-schedule greedy cover — variants sorted by stop-count
    * descending, each next variant kept only if NOT a sub-trip of an
    * already-kept one (reference `src/analyser/visual_schedule.rs:212-267`).
    * Variant lists are per-route and tiny: runs on collected rows. */
  def greedyVariantCover(variants: Seq[(Long, Seq[String])]): Seq[Long] = {
    val sorted = variants.sortBy { case (id, stops) => (-stops.length, id) }
    val kept = scala.collection.mutable.ArrayBuffer[(Long, Seq[String])]()
    sorted.foreach { case (id, stops) =>
      if (!kept.exists { case (_, ks) => isSubTrip(ks, stops) })
        kept += ((id, stops))
    }
    kept.map(_._1).toSeq
  }

  /** Per-variant ordered stop-id lists (input to W8), one shuffle. */
  def variantStopLists(schedule: GtfsStatic.Schedule): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("route_variant")).orderBy(col("rep_rank"))
    schedule.tripsWithVariant
      .select("trip_id", "route_id", "route_variant")
      .withColumn("rep_rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("route_variant")).orderBy(col("trip_id"))))
      .filter(col("rep_rank") === 1) // J5: representative trip per variant
      .join(graft.analyse.DelayAnalysis.scheduleStops(
        schedule).select("trip_id", "stop_index", "stop_id"), Seq("trip_id"))
      .groupBy("route_id", "route_variant")
      .agg(array_sort(collect_list(struct(col("stop_index"), col("stop_id")))).as("s"))
      .select(col("route_id"), col("route_variant"),
        transform(col("s"), _.getField("stop_id")).as("stop_ids"))
  }
}
