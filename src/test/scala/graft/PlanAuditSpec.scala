package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The registry-wide plan-shape gate (r7 — promoted from the dev-only
  * PlanAudit dumper): every SparkEntry query's PHYSICAL plan must be free
  * of the known scale-killer shapes, and the similarity battery must carry
  * its skew-guard branches. The r5/r6 plan defects (global rank windows in
  * q59/q64, mid-pipeline single-partition sorts in q57/q80/q81, the q39/
  * q49/q71 probe pick planning as a full global sort) were each found by
  * MANUAL plan reading; this spec fails the build on the next one. */
class PlanAuditSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val plans: Map[String, org.apache.spark.sql.execution.SparkPlan] =
    SparkEntry.queries.map { case (n, fn) =>
      n -> fn(spark, sfDir).queryExecution.sparkPlan
    }

  test("no registered query plans a cartesian, a global window, or a mid-pipeline global sort") {
    val bad = plans.toSeq.sortBy(_._1).flatMap { case (n, p) =>
      val f = PlanAudit.audit(p)
      if (f.isEmpty) None else Some(s"$n: ${f.describe}")
    }
    assert(bad.isEmpty, s"\nplan-shape violations:\n${bad.mkString("\n")}")
  }

  test("similarity battery plans carry their skew-guard branches") {
    // __salt = heavy posting-list / heavy-bucket salted scatter
    // (Salting.saltedJoin); __bi = triangle-blocked self-join cover
    // (Blocking.triangleSides). The guard branches are STATIC plan
    // structure — present whether or not the corpus trips them — so their
    // absence means the guard was dropped, not that the data is clean.
    val expected = Map(
      "q29_jaccard_pairs" -> "__bi",
      "q30_minhash_lsh" -> "__salt",
      "q35_embed_neardup" -> "__bi",
      "q44_jaccard_inverted" -> "__salt",
      "q48_charshingle_jaccard" -> "__salt",
      "q56_jaccard_prefix" -> "__salt",
      // q67 builds the same triangle-blocked edges (embedNearDupPairs, as
      // q35) but its registered plan is lineage-cut by the connected-
      // components checkpoint, so the marker is not visible there
      "q80_incremental_dedup" -> "__salt",
      "q92_knn_join" -> "__bi",
      // q103's Lloyd stage is lineage-cut (Checkpoints), but the
      // within-cell pair join is downstream of the checkpoint, so its
      // triangle cover stays visible in the registered plan
      "q103_semdedup" -> "__bi",
      "q106_knn_recall" -> "__bi")
    val missing = expected.toSeq.sortBy(_._1).collect {
      case (n, marker) if !PlanAudit.hasColumn(plans(n), marker) => s"$n lost $marker"
    }
    assert(missing.isEmpty, s"guard branches missing: ${missing.mkString(", ")}")
  }

  test("source filters reach the parquet scans") {
    // one representative per filter family: date range, value range,
    // disjunctive set-op branches, stratum equality, monitor window+stop
    val expected = Map(
      "q01_pricing_summary" -> "LessThanOrEqual(l_shipdate",
      "q19_value_histogram" -> "GreaterThanOrEqual(value,-3000",
      "q43_set_ops" -> "GreaterThan(o_totalprice",
      "q61_decontaminate" -> "EqualTo(source,src0)",
      "q50_departure_board" -> "In(stop_id")
    val missing = expected.toSeq.sortBy(_._1).collect {
      case (n, frag) if !PlanAudit.pushedFilters(plans(n)).mkString("|").contains(frag) =>
        s"$n: no pushed filter matching '$frag'"
    }
    assert(missing.isEmpty, s"pushdown broke: ${missing.mkString("; ")}")
  }

  // --- detector sanity: each rule must actually fire on an injected defect ---

  private def docs: DataFrame = spark.read.parquet(s"$sfDir/documents.parquet")

  test("detector flags an injected cartesian product") {
    // disable auto-broadcast so the planner cannot rescue the tiny test
    // input with a BroadcastNestedLoopJoin — at corpus scale it wouldn't
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val f = PlanAudit.audit(
        docs.as("a").crossJoin(docs.as("b")).queryExecution.sparkPlan)
      assert(f.cartesians.nonEmpty)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("detector flags an injected global rank window") {
    val f = PlanAudit.audit(docs
      .withColumn("r", row_number().over(Window.orderBy(col("doc_id"))))
      .queryExecution.sparkPlan)
    assert(f.globalWindows.nonEmpty)
  }

  test("detector flags an injected mid-pipeline global sort") {
    // the aggregate must be ORDER-SENSITIVE (collect_list) or Catalyst's
    // EliminateSorts removes the injected sort before it reaches the plan
    val f = PlanAudit.audit(docs.orderBy(col("doc_id"))
      .groupBy(col("source")).agg(collect_list(col("doc_id")))
      .queryExecution.sparkPlan)
    assert(f.midPipelineGlobalSorts.nonEmpty)
    // ...and accepts the legitimate final orderBy
    val ok = PlanAudit.audit(docs.groupBy(col("source")).count()
      .orderBy(col("source")).queryExecution.sparkPlan)
    assert(ok.isEmpty)
  }
}
