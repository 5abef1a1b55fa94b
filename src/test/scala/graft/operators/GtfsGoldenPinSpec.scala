package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Golden-file regression pins for the four curve-math registry queries
  * the driver can only rows-check (q41/q42/q50/q51 — float curve math has
  * no SQL twin). Their inputs are the COMMITTED fixtures (gtfs_tiny +
  * rt_tiny), so the outputs are fully deterministic: the expected rows are
  * committed under fixtures/golden/ and any future change that perturbs
  * the pipeline — including curve BYTES, via the to_json hashes — fails
  * here instead of hiding behind `no_oracle`.
  *
  * Regenerate (after an INTENDED behavior change, with the diff reviewed):
  *   GRAFT_REGEN_GOLDEN=1 sbt "testOnly graft.operators.GtfsGoldenPinSpec"
  */
class GtfsGoldenPinSpec extends SparkSpec {

  private val goldenDir = java.nio.file.Paths.get("fixtures", "golden")

  private def pin(name: String, df: DataFrame): Unit = {
    // canonical form: one JSON object per row, sorted — independent of
    // partitioning and of the query's own output order
    val got = df.toJSON.collect().toSeq.sorted
    val f = goldenDir.resolve(s"$name.jsonl")
    if (sys.env.get("GRAFT_REGEN_GOLDEN").contains("1")) {
      java.nio.file.Files.createDirectories(f.getParent)
      java.nio.file.Files.writeString(f, got.mkString("\n") + "\n")
    } else {
      assert(java.nio.file.Files.exists(f), s"missing golden file $f")
      val want = java.nio.file.Files.readString(f).split("\n").filter(_.nonEmpty).toSeq
      assert(got === want, s"$name drifted from fixtures/golden/$name.jsonl")
    }
  }

  test("q41 stop-pair curve sets incl. curve bytes match the committed golden") {
    val base = GtfsPipeline.registry("q41_gtfs_curvesets").build(spark, "")
    pin("q41_curvesets", base)
    // the registry projection exposes sizes only; pin the full curve
    // CONTENTS through a stable hash of their JSON rendering
    val curves = graft.analyse.DelayAnalysis.stopPairCurveSets(
      GtfsPipeline.fixtureProjectedForSpec(spark))
      .select(col("route_id"), col("route_variant"),
        col("start_stop_index"), col("end_stop_index"),
        col("time_slot_id"), col("event_type"),
        xxhash64(to_json(col("curves"))).as("curve_bytes_hash"))
    pin("q41_curve_bytes", curves)
  }

  test("q42 scheduled predictions incl. curve bytes match the committed golden") {
    pin("q42_predictions", GtfsPipeline.registry("q42_gtfs_predictions").build(spark, ""))
    val (_, preds) = GtfsPipeline.fixturePredictionsForSpec(spark)
    pin("q42_curve_bytes", preds.select(col("route_id"), col("trip_id"),
      col("trip_start_date"), col("stop_sequence"), col("event_type"),
      xxhash64(to_json(col("prediction_curve"))).as("curve_bytes_hash")))
  }

  test("q50 departure board matches the committed golden") {
    pin("q50_departure_board", GtfsPipeline.registry("q50_departure_board").build(spark, ""))
  }

  test("q51 transfer scores match the committed golden") {
    pin("q51_transfer_scores", GtfsPipeline.registry("q51_transfer_scores").build(spark, ""))
  }
}
