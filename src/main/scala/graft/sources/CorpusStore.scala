package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The curation corpus's at-scale physical layout — the documents-side
  * analogue of [[RecordsStore]].
  *
  * The assembly pipeline's repeated costs all key by doc_id (near-dup
  * pair join-backs, chunk reassembly, the q68 embedding join, manifest
  * composition) or by the content hash (exact dedup, incremental
  * batch-vs-corpus screening). Bucketing the stored corpus by doc_id
  * removes the scan-side Exchange from every doc_id join — at 100 TB
  * the difference between re-shuffling the corpus per curation pass and
  * reading it pre-clustered. Materializing the content hash at write
  * time means dedup passes shuffle 32-byte hashes without re-hashing
  * full documents per query, and hash-only passes never read `text` at
  * all (column pruning — asserted on the plan in CorpusStoreSpec).
  * Partitioning by source prunes the per-source curation family
  * (mixing quotas, length fences, overlap matrix). */
object CorpusStore {

  /** Save bucketed: requires a table catalog (saveAsTable); buckets=256
    * sizes ~100 TB / 256 ≈ 400 GB per bucket-chain before source
    * partitioning splits it further. Local tests use a smaller count. */
  def saveBucketed(documents: DataFrame, table: String, buckets: Int = 256): Unit =
    documents.withColumn("content_hash", md5(col("text")))
      .write.mode("overwrite")
      .partitionBy("source")
      .bucketBy(buckets, "doc_id")
      .sortBy("doc_id")
      .format("parquet")
      .saveAsTable(table)

  /** Embeddings co-bucketed on vec_id with the SAME bucket count, so
    * documents ⋈ embeddings (doc_id = vec_id) is Exchange-free on both
    * sides. */
  def saveEmbeddingsBucketed(embeddings: DataFrame, table: String,
                             buckets: Int = 256): Unit =
    embeddings.write.mode("overwrite")
      .bucketBy(buckets, "vec_id")
      .sortBy("vec_id")
      .format("parquet")
      .saveAsTable(table)

  def load(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
