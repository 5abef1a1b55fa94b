package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming data-quality monitor: the per-row rule families of q108
  * (completeness, value ranges — [[graft.operators.AuditQueries]]) over a
  * streaming relation, maintained as RUNNING `(check, n_bad, n_rows)`
  * counters.
  *
  * Shape: one global streaming aggregation whose state is the counter
  * set itself — a single row of conditional sums, bounded by the number
  * of RULES, never by throughput; the `stack` unpivot is a stateless
  * projection on the aggregate's output. Emit with `outputMode(update)`
  * (or `complete`) and every trigger reports the corpus-to-date totals —
  * the alerting feed a pipeline watches while ingesting.
  *
  * Scope note: referential-integrity rules are deliberately absent —
  * the parent key set is a TABLE, so streaming RI is a stream-static
  * join against it per batch (compose `stream.join(parentKeys,
  * "left")` upstream and count the null rule here if needed); the
  * uniqueness rule is likewise a stateful-dedup concern
  * ([[DocStream.curateBounded]]'s machinery), not a counter. */
object AuditStream {

  /** Running rule counters. `rules` = (name, violation predicate). */
  def ruleCounts(stream: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    // coalesce mirrors q108's scalarAudit: sum() over zero rows is NULL,
    // so a complete-mode snapshot before any data must still report 0,
    // not NULL, to keep the batch-audit semantics this module claims
    val aggs = rules.map { case (n, p) =>
      coalesce(sum(when(p, 1L).otherwise(0L)), lit(0L)).as(s"__$n")
    }
    stream
      .groupBy() // global: state is ONE row of counters
      .agg(count(lit(1)).as("__n"), aggs: _*)
      .select(graft.operators.AuditQueries.stackChecks(
          rules.map { case (n, _) => n -> col(s"__$n") }: _*)
          .as(Seq("check", "n_bad")),
        col("__n").as("n_rows"))
  }

  /** The events-stream rule set matching q108's scalar family. */
  def eventRules: Seq[(String, Column)] = Seq(
    "value_complete" -> col("value").isNull,
    "value_nonnegative" -> (col("value") < 0))

  /** q108's streaming twin over an events-shaped stream. */
  def eventAudit(stream: DataFrame): DataFrame =
    ruleCounts(stream, eventRules)
}
