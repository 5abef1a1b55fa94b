package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketing removes the scan-side shuffle from doc_id-keyed curation
  * joins, and the materialized content hash keeps hash-only passes off
  * the text column — both asserted on the physical plan. */
class CorpusStoreSpec extends SparkSpec {

  test("co-bucketed documents x embeddings joins without a scan-side Exchange; hash passes prune text") {
    import spark.implicits._
    val docs = (0L until 64L).map(i =>
      (i, s"doc body $i ${"tok " * (i % 5).toInt}", s"src${i % 4}"))
      .toDF("doc_id", "text", "source")
    val embs = (0L until 64L).map(i =>
      (i, Array.fill(4)((i % 7).toFloat), (i % 3).toInt))
      .toDF("vec_id", "embedding", "label")
    CorpusStore.saveBucketed(docs, "corpus_bucketed_test", buckets = 4)
    CorpusStore.saveEmbeddingsBucketed(embs, "embs_bucketed_test", buckets = 4)
    // model the 100 TB regime: neither side broadcastable, so the join
    // must rely on bucketing, not on BroadcastHashJoin hiding the shuffle
    val savedThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val d = CorpusStore.load(spark, "corpus_bucketed_test")
      val e = CorpusStore.load(spark, "embs_bucketed_test")
      val joined = d.join(e, d("doc_id") === e("vec_id"))
        .select(col("doc_id"), col("content_hash"), col("label"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffle-family join over bucketed scans, got:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"co-bucketed join must not re-shuffle either scan:\n$plan")
      assert(joined.count() == 64)

      // exact-dup pass over the materialized hash: the scan must prune
      // `text` entirely (the whole point of materializing the hash) —
      // asserted on the scans' required schemas, not a plan-string grep
      val dup = d.groupBy(col("content_hash")).agg(count(lit(1)).as("n"))
      val scanSchemas = dup.queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.requiredSchema.fieldNames.toSet
      }
      assert(scanSchemas.nonEmpty &&
        scanSchemas.forall(!_.contains("text")),
        s"hash-only dedup pass must not read text: $scanSchemas")
      assert(dup.count() == 64)

      // source partition pruning: a per-source pass scans one partition
      val pruned = d.filter(col("source") === "src1")
      val prunedPlan = pruned.queryExecution.executedPlan.toString
      assert(prunedPlan.contains("src1"),
        s"expected source partition filter in scan:\n$prunedPlan")
      assert(pruned.count() == 16)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedThreshold)
      spark.sql("DROP TABLE IF EXISTS corpus_bucketed_test")
      spark.sql("DROP TABLE IF EXISTS embs_bucketed_test")
    }
  }
}
