package graft.operators

import graft.SparkSpec
import graft.model.PrecisionType
import org.apache.spark.sql.functions._

/** End-to-end over the committed fixtures (this is what the driver's
  * entry-point smoke runs). */
class GtfsPipelineSpec extends SparkSpec {

  test("q40: 40 feeds produce the expected records") {
    val r = GtfsPipeline.registry("q40_gtfs_records").build(spark, "")
    // 40 days x 3 tA1 stops + 8 tB2 updates; ghost trips dropped
    assert(r.count() == 40 * 3 + 8)
    assert(r.filter(col("trip_id") === "ghost").count() == 0)
  }

  test("q41: curve sets exist for the trained stop pairs") {
    val cs = GtfsPipeline.registry("q41_gtfs_curvesets").build(spark, "").cache()
    assert(cs.count() > 0)
    // the (0,3) DEFAULT-slot arrival pair must be present (40 samples)
    assert(cs.filter(col("start_stop_index") === 0 &&
      col("end_stop_index") === 3 && col("time_slot_id") === 12 &&
      col("event_type") === 1).count() == 1)
  }

  test("q42 (flagship entry): predictions for the horizon with full ladder") {
    val p = graft.SparkEntry.entry(spark).cache()
    assert(p.count() > 0)
    val precisions = p.select("precision_type").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(precisions.contains(PrecisionType.SemiSpecific))
    // rB trips resolve through the default path
    assert(p.filter(col("route_id") === "rB").count() > 0)
  }
}
