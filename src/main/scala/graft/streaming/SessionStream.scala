package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sessionization over Spark's NATIVE session window — the built-in
  * operator twin of q91's lag→flag→running-sum construction (reference
  * scope note: the reference engine has no clickstream battery; this
  * extends the engine per the build brief, like the rest of the events
  * family).
  *
  * Boundary semantics (measured, spec-pinned): `session_window`
  * assigns each event the window [ts, ts + gap) and merges windows
  * that overlap OR TOUCH — an event at exactly ts + gap extends the
  * session — so the split condition is gap > `gap`, identical to
  * q91's lag construction. The q104 oracle re-derives the rollup
  * (with window bounds) via that construction in DuckDB.
  *
  * Scale shape: the merge is one shuffle keyed by user_id (Spark's
  * MergingSessionsExec aggregates sessions in sort order per key —
  * group size bounded by one user's events, the J3/W1 argument), and in
  * streaming the state store holds only OPEN sessions per user; the
  * watermark closes and evicts them, so state is bounded by concurrent
  * active users, not history. */
object SessionStream {

  /** Gap-merged event-time sessions per user. Batch: call directly
    * (q104 registers it against the DuckDB lag-construction oracle).
    * Streaming: use [[sessionStream]], which adds the watermark that
    * append mode needs to finalize windows. */
  def sessionWindows(events: DataFrame, gap: String = "2 hours"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"))
      .select(col("user_id"), col("w.start").as("w_start"),
        col("w.end").as("w_end"), col("n_events"),
        col("start_ts"), col("end_ts"))

  /** Streaming twin: append mode emits each session EXACTLY once, when
    * the watermark passes its close (end + delay) — the streaming
    * counterpart of the batch rollup, pinned equal across arbitrary
    * micro-batch splits by SessionStreamSpec. */
  def sessionStream(events: DataFrame, gap: String = "2 hours",
                    watermarkDelay: String = "0 seconds"): DataFrame =
    sessionWindows(events.withWatermark("ts", watermarkDelay), gap)
}
