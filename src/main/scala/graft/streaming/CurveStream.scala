package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import graft.curves.Curve
import graft.analyse.CurvePoint

/** §2.8 extension: INCREMENTAL curve maintenance. The reference (and the
  * batch `analyse` pipeline here, SURVEY §3.2) rebuilds delay statistics
  * from all records in a scheduled offline run; this operator keeps the
  * general per-stop curves (A8 semantics) CONTINUOUSLY up to date from the
  * observation stream instead.
  *
  * The trick that makes streaming maintenance exact rather than
  * approximate: delays are INTEGERS (seconds), so a per-group count
  * histogram `delay → n` is a lossless sufficient statistic for the
  * unit-weight ECDF — and [[Curve.makeCurveFromCounts]] rebuilds from it
  * the bit-identical curve the batch builder gets from the full sample
  * multiset (spec-pinned). No reservoir, no sketch, no approximation.
  *
  * State is BOUNDED by the delay domain, not the observation count: a
  * group's histogram has at most one entry per distinct integer delay
  * (≤ 72 001 under the ±36 000 validity rule F1, a few hundred in
  * practice), so a year of observations costs the same state as a day —
  * the property that lets the automatic mode run unbounded. Emission is
  * Update-mode: each micro-batch re-emits curves only for groups it
  * touched, gated by the same ≥ `minSamples` rule (F9) as the batch
  * builder. */
object CurveStream {

  /** One delay observation, already classified (route/variant resolved
    * against the schedule, time slot from [[graft.model.Classifiers]]). */
  final case class DelayObs(route_id: String, route_variant: Long,
      stop_index: Int, event_type: Int, time_slot_id: Int, delay: Int)

  /** An updated general curve for one group, as emitted after a batch. */
  final case class CurveUpdate(route_id: String, route_variant: Long,
      stop_index: Int, event_type: Int, time_slot_id: Int,
      precision_type: Int, sample_size: Int, points: Seq[CurvePoint])

  private type Key = (String, Long, Int, Int, Int)

  /** Build the A8 general curve from a histogram: ≥ minSamples values,
    * makeCurve without focus, simplify(0.01), SemiSpecific — the
    * [[graft.curves.CurveBuilder.generalDelayCurve]] contract, fed from
    * counts. */
  private[streaming] def curveFromHistogram(key: Key, h: Map[Int, Long],
                                            minSamples: Int)
  : Option[CurveUpdate] = {
    val n = h.valuesIterator.sum
    if (n < minSamples) None
    else Curve.makeCurveFromCounts(
      h.iterator.map { case (d, c) => (d.toFloat, c) }.toSeq)
      .map { case (c, _) =>
        CurveUpdate(key._1, key._2, key._3, key._4, key._5,
          graft.model.PrecisionType.SemiSpecific, n.toInt,
          c.simplify(0.01f).points.map(p => CurvePoint(p._1, p._2)))
      }
  }

  /** Continuous general-curve maintenance over an observation stream.
    * One stateful shuffle keyed by curve group; per batch each touched
    * group folds its new delays into the histogram and re-emits its
    * curve when it has reached `minSamples`. */
  def generalCurveStream(obs: Dataset[DelayObs],
                         minSamples: Int = 20): Dataset[CurveUpdate] = {
    val spark = obs.sparkSession
    import spark.implicits._
    obs
      .groupByKey(o => (o.route_id, o.route_variant, o.stop_index,
        o.event_type, o.time_slot_id))
      .flatMapGroupsWithState[Map[Int, Long], CurveUpdate](
        OutputMode.Update(), GroupStateTimeout.NoTimeout)(
        (key: Key, rows: Iterator[DelayObs], state) => {
          var h = state.getOption.getOrElse(Map.empty[Int, Long])
          rows.foreach { o =>
            h = h.updated(o.delay, h.getOrElse(o.delay, 0L) + 1L)
          }
          state.update(h)
          curveFromHistogram(key, h, minSamples).iterator
        })
  }

  /** Batch twin for verification and backfill: the same histogram → curve
    * path over a static DataFrame of observations. The streaming operator
    * must converge to exactly this after any batch split (spec-pinned),
    * and it must equal the batch builder's expansion-based curve. */
  def generalCurvesBatch(obs: DataFrame, minSamples: Int = 20): DataFrame = {
    val spark = obs.sparkSession
    import spark.implicits._
    obs.select(col("route_id"), col("route_variant"), col("stop_index"),
      col("event_type"), col("time_slot_id"), col("delay"))
      .as[DelayObs]
      .groupByKey(o => (o.route_id, o.route_variant, o.stop_index,
        o.event_type, o.time_slot_id))
      .mapGroups { (key, rows) =>
        val h = scala.collection.mutable.Map.empty[Int, Long]
        rows.foreach(o => h(o.delay) = h.getOrElse(o.delay, 0L) + 1L)
        (key, h.toMap)
      }
      .flatMap { case (key, h) => curveFromHistogram(key, h, minSamples) }
      .toDF()
  }
}
