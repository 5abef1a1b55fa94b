package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitter summary (Misra & Gries 1982) as a typed
  * Aggregator: the buffer is at most `k` (key, counter) pairs — bounded
  * state regardless of stream length or key universe, natively
  * row-encodable, map-side combinable. The per-group alternative (exact
  * groupBy counts) shuffles the full token relation; this shuffles at
  * most k counters per partial aggregate.
  *
  * Guarantee (m = the group's total element count): for every key x,
  * count(x) − m/(k+1) ≤ reported(x) ≤ count(x), so every x with
  * count(x) > m/(k+1) SURVIVES in the summary. Merging two summaries
  * sums counters and, when more than k keys remain, subtracts the
  * (k+1)-th largest counter from all and drops the non-positive — the
  * mergeable-summaries rule (Agarwal et al., PODS 2012) that keeps the
  * error bound additive across partials, which is what makes map-side
  * partial aggregation sound.
  *
  * `finish` returns the surviving KEYS only: a candidate SUPERSET of
  * {x : count(x) > m/(k+1)} whose exact counts a verification pass must
  * re-count (see CurationQueries.heavyHitters) — reported counters are
  * lower bounds, not exact frequencies, so they never appear in output. */
class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Array[String]] {

  require(k >= 1)

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
    b.get(a) match {
      case Some(c) => b.updated(a, c + 1)
      case None if b.size < k => b.updated(a, 1L)
      // full and absent: decrement every counter (the classic k-way
      // cancellation — one occurrence of each of k+1 distinct keys
      // annihilates), dropping keys that reach zero
      case None => b.collect { case (s, c) if c > 1 => s -> (c - 1) }
    }

  override def merge(x: Map[String, Long], y: Map[String, Long])
  : Map[String, Long] = {
    val sum = y.foldLeft(x) { case (acc, (s, c)) =>
      acc.updated(s, acc.getOrElse(s, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      // subtract the (k+1)-th largest counter; strictly larger survive
      val cut = sum.valuesIterator.toArray.sorted(Ordering[Long].reverse)(k)
      sum.collect { case (s, c) if c > cut => s -> (c - cut) }
    }
  }

  override def finish(b: Map[String, Long]): Array[String] =
    b.keysIterator.toArray.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Array[String]] =
    ExpressionEncoder[Array[String]]()
}
