package graft.analyse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S7: the statistics store. The reference serializes one nested
  * `DelayStatistics` tree to MessagePack (`all_curves.exp` /
  * `default_curves.exp`, `src/analyser/curves.rs:43`,
  * `src/types/delay_statistics.rs:29-49`) with an optional directory-tree
  * layout (`save_tree`, `types.md:19-27`). The relational replacement is
  * three parquet tables; `save_tree`'s route/variant directory nesting IS
  * parquet `partitionBy(route_id)` — partition pruning then serves the
  * per-route scans (S6) that the reference does with SQL WHERE clauses.
  *
  * The reference's statistics merge (`src/main.rs:295-318`: specific curves
  * from `all_curves.exp` + general curves from `default_curves.exp`) becomes
  * two independent table reads — no merge step needed.
  */
object StatisticsIO {

  val GeneralDir = "general_delay_curves"
  val CurveSetsDir = "curve_sets"
  val DefaultDir = "default_curves"

  /** Write all three statistics tables under `baseDir`. The per-variant
    * tables partition by route_id (bounded cardinality, prunes per-route
    * lookups); default curves are a tiny grid — a single file. */
  def save(baseDir: String, general: DataFrame, curveSets: DataFrame,
           defaults: DataFrame): Unit = {
    general.write.mode("overwrite")
      .partitionBy("route_id").parquet(s"$baseDir/$GeneralDir")
    curveSets.write.mode("overwrite")
      .partitionBy("route_id").parquet(s"$baseDir/$CurveSetsDir")
    defaults.coalesce(1).write.mode("overwrite").parquet(s"$baseDir/$DefaultDir")
  }

  final case class Statistics(general: DataFrame, curveSets: DataFrame,
                              defaults: DataFrame)

  def load(spark: SparkSession, baseDir: String): Statistics = Statistics(
    general = spark.read.parquet(s"$baseDir/$GeneralDir"),
    curveSets = spark.read.parquet(s"$baseDir/$CurveSetsDir"),
    defaults = spark.read.parquet(s"$baseDir/$DefaultDir"))

  /** Run the whole analyse pipeline and persist it (the `analyse
    * compute-curves --all` entry point, SURVEY.md §3.2). */
  def computeAndSave(records: DataFrame, schedule: graft.gtfs.GtfsStatic.Schedule,
                     baseDir: String): Statistics = {
    val projected = DelayAnalysis.projectedRecords(records, schedule)
    // the projection feeds three aggregations: materialize it once
    projected.persist()
    try {
      save(baseDir,
        DelayAnalysis.generalDelayCurves(projected),
        DelayAnalysis.stopPairCurveSets(projected),
        // A9 consumes the RAW records, not the gap-filled projections
        // (reference default_curves.rs:115-117)
        DelayAnalysis.defaultCurves(records, schedule, schedule.routes))
    } finally projected.unpersist()
    load(records.sparkSession, baseDir)
  }
}
