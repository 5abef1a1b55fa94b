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
          graft.model.PrecisionType.SemiSpecific,
          // saturate, don't wrap: past 2^31 lifetime observations the
          // reported size pins at MaxValue (and past 2^24 the bit-equality
          // claim vs the expansion relaxes to the last float ulp — the
          // inherent resolution of a float ECDF at that mass; r7 review)
          math.min(n, Int.MaxValue.toLong).toInt,
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
          // mutable fold: one allocation per batch, not per observation
          val h = scala.collection.mutable.Map.empty[Int, Long]
          state.getOption.foreach(m => h ++= m)
          rows.foreach(o => h(o.delay) = h.getOrElse(o.delay, 0L) + 1L)
          val m = h.toMap
          state.update(m)
          curveFromHistogram(key, m, minSamples).iterator
        })
  }

  /** One stop-pair delay observation (A7 input contract: delays already
    * |d| < 3000-thresholded and 12 s-rounded, as
    * [[graft.analyse.DelayAnalysis.stopPairRowsBase]] emits them). */
  final case class PairObs(route_id: String, route_variant: Long,
      start_idx: Int, end_idx: Int, event_type: Int, time_slot_id: Int,
      start_delay: Float, end_delay: Float)

  /** An updated curve SET for one stop-pair group and slot. */
  final case class CurveSetUpdate(route_id: String, route_variant: Long,
      start_stop_index: Int, end_stop_index: Int, time_slot_id: Int,
      event_type: Int, precision_type: Int, sample_size: Int,
      curves: Seq[graft.analyse.FocusCurve])

  /** Incremental A7: continuous stop-pair curve-SET maintenance. Pair
    * delays arrive rounded to 12 s multiples (the F2/F3 contract), so the
    * (slot, start, end) COUNT histogram is again a lossless sufficient
    * statistic; emission expands the histogram and runs the SAME build
    * body as the batch aggregate
    * ([[graft.analyse.DelayAnalysis.buildPairCurveSets]]) — input order
    * is irrelevant because the builder sorts, so streamed curve sets are
    * bit-equal to the offline build over the same observations
    * (spec-pinned). State per group is bounded by the distinct
    * (slot, start, end) domain (≤ slots × 499² under F2/F3, a few
    * hundred in practice); the transient expansion at emission is the
    * same group multiset the batch builder holds. */
  def pairCurveStream(obs: Dataset[PairObs]): Dataset[CurveSetUpdate] = {
    val spark = obs.sparkSession
    import spark.implicits._
    obs
      .groupByKey(o => (o.route_id, o.route_variant, o.start_idx,
        o.end_idx, o.event_type))
      .flatMapGroupsWithState[Array[((Int, Float, Float), Long)], CurveSetUpdate](
        OutputMode.Update(), GroupStateTimeout.NoTimeout)(
        (key: (String, Long, Int, Int, Int), rows: Iterator[PairObs], state) => {
          val h = scala.collection.mutable.Map.empty[(Int, Float, Float), Long]
          state.getOption.foreach(_.foreach { case (k, c) => h(k) = c })
          rows.foreach { o =>
            val k = (o.time_slot_id, o.start_delay, o.end_delay)
            h(k) = h.getOrElse(k, 0L) + 1L
          }
          state.update(h.toArray)
          // transient expansion: the SAME group multiset the batch builder
          // holds — per-emission cost is O(lifetime observations of this
          // group). Deployments with unbounded per-group volume should
          // window the key (slot taxonomy already bounds it in practice)
          // or age state out; a count that no longer fits an Int cannot
          // expand — fail loudly rather than silently truncate (r7 review)
          val all = h.iterator.flatMap { case ((slot, sd, ed), c) =>
            require(c <= Int.MaxValue,
              s"pairCurveStream: count $c for ($slot, $sd, $ed) exceeds " +
                "Int.MaxValue — the group multiset can no longer be expanded")
            Iterator.fill(c.toInt)((slot, sd, ed))
          }.toSeq
          graft.analyse.DelayAnalysis.buildPairCurveSets(all).iterator
            .map { case (slot, pt, n, curves) =>
              CurveSetUpdate(key._1, key._2, key._3, key._4, slot,
                key._5, pt, n, curves)
            }
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
