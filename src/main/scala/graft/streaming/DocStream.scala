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
  * State note: `dropDuplicates` on the content hash keeps one state row
  * per distinct retained document. For bounded state on an unbounded
  * feed, pass an ingest-time column and a watermark —
  * `dropDuplicatesWithinWatermark` then expires old hashes, trading
  * global for windowed exactness (the same trade RtStream's windowed
  * stats make). */
object DocStream {

  def curate(docs: DataFrame, chunkTokens: Int = 32, stride: Int = 24): DataFrame = {
    val tk = split(col("text"), " ")
    docs
      .withColumn("reason_mask", graft.operators.PipelineQueries.ruleMask)
      .filter(col("reason_mask") === 0)
      .withColumn("h", md5(col("text")))
      .dropDuplicates("h")
      .withColumn("s", explode(sequence(lit(1), size(tk), lit(stride))))
      .select(col("doc_id"),
        ((col("s") - 1) / stride).cast("long").as("chunk_id"),
        concat_ws(" ", slice(tk, col("s"), lit(chunkTokens))).as("chunk_text"))
  }
}
