package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geographic scalar functions (reference uses the `geo` crate's haversine,
  * `src/monitor/journey_data.rs:73,244`). Built from codegen'd math
  * expressions — no UDF. */
object Geo {
  val EarthRadiusMeters = 6371000.0

  /** Great-circle distance in meters between (lat1, lon1) and (lat2, lon2),
    * all in degrees. */
  def haversineMeters(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val a = pow(sin(dLat), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2)
    lit(2 * EarthRadiusMeters) * asin(sqrt(a))
  }
}
