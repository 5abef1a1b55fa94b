package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

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

  /** Executor-memory-bounded streaming state (r7): the watermark bounds
    * the number of state ROWS, but Spark's default HDFS-backed provider
    * keeps every row on-heap per executor — at horizon-scale throughput
    * (the 100 TB firehose this pipeline targets) dedup state alone would
    * bound executor memory. The bundled RocksDB provider keeps state on
    * local disk with an in-memory working set; wire it with
    * `spark.conf.set(StateStoreProviderKey, RocksDbStateStoreProvider)`
    * before starting the query. DocStreamSpec runs the bounded-dedup
    * expiry contract under BOTH providers — the choice changes memory
    * residency, never results. */
  val StateStoreProviderKey = "spark.sql.streaming.stateStore.providerClass"
  val RocksDbStateStoreProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

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

  /** Streaming distinct-count sketch — q74's streaming twin: one KMV
    * sketch per source carried across micro-batches in
    * `mapGroupsWithState` (state ≤ k hash values per source forever; a
    * streaming `approx_count_distinct` agg cannot emit per-trigger
    * running estimates in update mode without a watermark, and exact
    * streaming distinct state grows with the universe). The caller
    * pre-hashes values to [0, M) with the same portable multiplicative
    * hash q74 uses, so the estimator (k−1)·M/h_k — or n_kept exactly
    * when below k — is reproducible offline from the emitted
    * (n_kept, kth_min) pair. Same distinct-hash-collision caveat as
    * [[graft.functions.KmvSketch]]. */
  def distinctSketchStream(hashed: DataFrame, k: Int = 256): DataFrame = {
    val spark = hashed.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val agg = new graft.functions.KmvSketch(k)
    hashed.select(col("source"), col("h")).as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[Array[Long], (String, Int, Long)](
        GroupStateTimeout.NoTimeout) { (src, rows, state) =>
          val merged = rows.foldLeft(state.getOption.getOrElse(agg.zero)) {
            (b, r) => agg.reduce(b, r._2)
          }
          state.update(merged)
          val (nKept, kthMin) = agg.finish(merged)
          (src, nKept, kthMin)
        }
      .toDF("source", "n_kept", "kth_min")
  }

  /** Streaming heavy-hitter tracking — q77's streaming twin: one
    * Misra-Gries summary per source carried across micro-batches in
    * `mapGroupsWithState`, so state is ≤ 2k counters per source FOREVER,
    * independent of stream length (contrast: a streaming groupBy(token)
    * count grows state with the vocabulary). Each trigger folds the
    * batch's tokens into the stored summary with the same reduce the
    * batch aggregator uses, then re-emits the source's current summary
    * (update output mode).
    *
    * Emitted rows are (source, token, lower_bound) with the batch
    * operator's candidate-superset contract: every token whose
    * stream-so-far count exceeds m/(k+1) is present, counters are lower
    * bounds — a consumer needing exact counts closes the gap with a
    * recount over the flagged tokens, exactly like q77's verify pass. */
  def heavyHitterStream(tokens: DataFrame, k: Int = 64): DataFrame = {
    val spark = tokens.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val agg = new graft.functions.MisraGries(k)
    tokens.select(col("source"), col("token")).as[(String, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[Map[String, Long], (String, Map[String, Long])](
        GroupStateTimeout.NoTimeout) { (src, rows, state) =>
          val merged = rows.foldLeft(state.getOption.getOrElse(agg.zero)) {
            (b, r) => agg.reduce(b, r._2)
          }
          state.update(merged)
          (src, merged)
        }
      .toDF("source", "counters")
      .select(col("source"),
        explode(col("counters")).as(Seq("token", "lower_bound")))
  }

  /** Streaming BM25 index maintenance — q126's streaming twin: keep the
    * retrieval index ([[graft.operators.CurationQueries.Bm25Index]])
    * fresh as documents arrive, without the scheduled full rebuild (the
    * CurveStream discipline applied to retrieval). Each micro-batch
    * writes three IDEMPOTENT batch-keyed partitions:
    *   `tf/batch_id=N` — the batch's postings (doc_id, dl, token, tf);
    *   `dfd/batch_id=N` — the batch's df DELTA (token, df);
    *   `tot/batch_id=N` — the batch's (n_docs, s_tokens) row.
    * Document frequencies and totals are ADDITIVE across batches as
    * long as a document never spans batches (each doc's postings, dl
    * and df contribution ride one batch), so [[loadBm25Index]] folds
    * the deltas at load time. A replayed batch OVERWRITES its own
    * partition — exactly-once index contents under foreachBatch's
    * at-least-once replay, with no read-modify-write of shared state in
    * the hot path (contrast UpsertSink's keyed merge, which pays a read
    * of the touched partitions per batch; pure partition overwrites are
    * the cheaper discipline when deltas are additive). */
  def bm25IndexSink(path: String): (DataFrame, Long) => Unit =
    (batch, batchId) => graft.operators.Checkpoints.releasingScoped {
      // buildBm25Index one-shot-truncates the tf relation; with a
      // reliable checkpoint dir configured a long-running stream would
      // otherwise accumulate one directory per micro-batch (r8 ADVICE).
      // The scoped release deletes exactly this batch's checkpoints
      // once the three writes below have consumed them.
      val idx = graft.operators.CurationQueries.buildBm25Index(batch)
      idx.tf.write.mode("overwrite").parquet(s"$path/tf/batch_id=$batchId")
      idx.df.write.mode("overwrite").parquet(s"$path/dfd/batch_id=$batchId")
      idx.totals.write.mode("overwrite").parquet(s"$path/tot/batch_id=$batchId")
    }

  /** Load the streamed index: postings read as-is; df/totals fold their
    * per-batch deltas (a VOCABULARY-sized aggregate over #batches
    * deltas — load-time cost, zero hot-path cost; a deployment with
    * thousands of batches compacts by rewriting the folded result as
    * one delta). Scoring against the result is
    * [[graft.operators.CurationQueries.bm25ScoreIndexed]], identical to
    * an offline-built index (spec-pinned). */
  def loadBm25Index(spark: org.apache.spark.sql.SparkSession,
                    path: String): graft.operators.CurationQueries.Bm25Index =
    graft.operators.CurationQueries.Bm25Index(
      spark.read.parquet(s"$path/tf")
        .select(col("doc_id"), col("dl"), col("token"), col("tf")),
      spark.read.parquet(s"$path/dfd")
        .groupBy(col("token")).agg(sum(col("df")).as("df")),
      spark.read.parquet(s"$path/tot")
        .agg(sum(col("n_docs")).as("n_docs"),
          sum(col("s_tokens")).as("s_tokens")))

  /** A near-duplicate match surfaced by [[nearDupStream]]: `doc_id` is
    * the arriving document, `matched_id` a previously-seen bucket-mate,
    * `n_equal_sigs` ∈ [4, 16] the matching MinHash components (÷16 ≈
    * Jaccard estimate; ≥ 4 because they share the colliding band). */
  final case class NearDupMatch(doc_id: Long, matched_id: Long,
                                n_equal_sigs: Int)

  /** Streaming NEAR-duplicate detection — q66's streaming twin, closing
    * the gap [[curate]]'s exact content-hash dedup leaves: a paraphrased
    * or lightly-edited re-submission sails through exact dedup but
    * collides here. Per arriving document: the q66 portable MinHash
    * signature (16 affine permutations over [[graft.functions.GramHashArray]]
    * fingerprints — computed PER ROW, no doc_id aggregate, so the stream
    * needs no extra shuffle beyond the bucket key), banded 4×4; each
    * (band, 4-signature bucket) group keeps the documents seen in that
    * bucket and emits a match for every stored bucket-mate of a new
    * arrival.
    *
    * State is bounded per bucket by `maxPerBucket` (FIFO eviction —
    * oldest stored docs age out first, the natural choice when near-dups
    * cluster in time); a pair colliding in several bands is emitted once
    * per band — consumers dedupe on (doc_id, matched_id), as the batch
    * LSH's `distinct()` does. */
  def nearDupStream(docs: DataFrame, maxPerBucket: Int = 1024): Dataset[NearDupMatch] = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    import graft.operators.DedupQueries
    val sig = array((0 until 16).map(k => array_min(transform(
      graft.functions.GramHashArray(col("text"), stride = 4),
      g => (g * DedupQueries.minhashA(k) + DedupQueries.minhashB(k))
        % DedupQueries.MinhashP))): _*)
    val bandStructs = (0 until 4).map(b => struct(lit(b).as("band"),
      col("sig")(4 * b).as("s0"), col("sig")(4 * b + 1).as("s1"),
      col("sig")(4 * b + 2).as("s2"), col("sig")(4 * b + 3).as("s3")))
    docs.filter(length(col("text")) >= 8)
      .select(col("doc_id"), sig.as("sig"))
      .select(col("doc_id"), col("sig"), explode(array(bandStructs: _*)).as("b"))
      .select(col("b.band").as("band"), col("b.s0").as("s0"), col("b.s1").as("s1"),
        col("b.s2").as("s2"), col("b.s3").as("s3"), col("doc_id"), col("sig"))
      .as[(Int, Long, Long, Long, Long, Long, Seq[Long])]
      .groupByKey(r => (r._1, r._2, r._3, r._4, r._5))
      .flatMapGroupsWithState[Array[(Long, Seq[Long])], NearDupMatch](
        OutputMode.Update(), GroupStateTimeout.NoTimeout)(
        (_, rows, state) => {
          var stored = state.getOption.getOrElse(Array.empty[(Long, Seq[Long])])
          val out = Seq.newBuilder[NearDupMatch]
          rows.foreach { r =>
            val (id, s) = (r._6, r._7)
            stored.foreach { case (oid, os) =>
              if (oid != id)
                out += NearDupMatch(id, oid,
                  s.iterator.zip(os.iterator).count(p => p._1 == p._2))
            }
            if (!stored.exists(_._1 == id)) {
              stored = if (stored.length >= maxPerBucket)
                stored.drop(1) :+ ((id, s)) // FIFO: evict the oldest
              else stored :+ ((id, s))
            }
          }
          state.update(stored)
          out.result().iterator
        })
  }
}
