package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming corpus curation: the q65 rule filter → exact dedup →
  * q60 chunking, as one Structured Streaming pipeline over a streaming
  * `(doc_id, text)` relation. The batch battery proves each operator's
  * semantics against the DuckDB oracle; this wires the same logic into
  * `readStream`-shaped ingestion (a training-data firehose: keep quality
  * docs, drop exact repeats ACROSS micro-batches, emit context-window
  * chunks).
  *
  * State note: [[curate]]'s `dropDuplicates` on the content hash keeps
  * one state row per distinct retained document — exact global dedup,
  * unbounded state. [[curateBounded]] is the production default for an
  * unbounded feed: an ingest-time watermark +
  * `dropDuplicatesWithinWatermark` expires old hashes, trading global
  * for windowed exactness (the same trade RtStream's windowed stats
  * make) — a document re-ingested after the horizon is admitted again. */
object DocStream {

  private def ruleFilteredHashed(docs: DataFrame): DataFrame =
    docs
      .withColumn("reason_mask", graft.operators.PipelineQueries.ruleMask)
      .filter(col("reason_mask") === 0)
      .withColumn("h", md5(col("text")))

  private def chunked(docs: DataFrame, chunkTokens: Int, stride: Int): DataFrame = {
    val tk = split(col("text"), " ")
    docs
      .withColumn("s", explode(sequence(lit(1), size(tk), lit(stride))))
      .select(col("doc_id"),
        ((col("s") - 1) / stride).cast("long").as("chunk_id"),
        concat_ws(" ", slice(tk, col("s"), lit(chunkTokens))).as("chunk_text"))
  }

  /** Exact global dedup — state grows with the distinct corpus; use for
    * bounded backfills. */
  def curate(docs: DataFrame, chunkTokens: Int = 32, stride: Int = 24): DataFrame =
    chunked(ruleFilteredHashed(docs).dropDuplicates("h"), chunkTokens, stride)

  /** Bounded-state curation for unbounded feeds: `docs` must carry an
    * event-time column `ts`; content hashes expire once the watermark
    * passes their event time + `watermarkDelay`, so state is bounded by
    * the horizon's document throughput instead of the corpus. */
  def curateBounded(docs: DataFrame, watermarkDelay: String,
                    chunkTokens: Int = 32, stride: Int = 24): DataFrame =
    chunked(
      ruleFilteredHashed(docs)
        .withWatermark("ts", watermarkDelay)
        .dropDuplicatesWithinWatermark("h"),
      chunkTokens, stride)
}
