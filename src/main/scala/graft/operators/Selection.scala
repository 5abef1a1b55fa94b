package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact per-group order statistics WITHOUT sorting the data — iterative
  * radix-refinement selection (the distributed k-th-smallest algorithm;
  * Munro-Paterson lineage).
  *
  * A per-group window sort is one task per group; a global orderBy is a
  * full range sort of the corpus. This needs neither: round r buckets
  * every value by its signed ARITHMETIC right shift `v >> shift_r`
  * (shift descending 54, 44, …, 4, 0 — shifts preserve signed order and
  * cannot overflow, unlike subtraction under ANSI mode), restricted to
  * the group's prefix chosen so far. One aggregate pass per round
  * produces the dimension-sized (group, bucket) histogram; the driver
  * narrows each group's prefix to the bucket containing its k-th value
  * and reduces k by the mass below. After the shift-0 round the bucket
  * IS the value. Seven aggregate passes cover the full 64-bit domain —
  * each embarrassingly parallel with map-side partial aggregation; no
  * data shuffle, no per-group funnel, driver state is groups × 1. */
object Selection {

  /** The k-th smallest (1-based, k = kOfN(group count)) of `valueCol`
    * per `groupCol`. Returns (groupCol: string, valueCol: long) — one
    * row per group. */
  def kthSmallest(data: DataFrame, groupCol: String, valueCol: String,
                  kOfN: Long => Long, shiftStep: Int = 10): DataFrame = {
    // persist: every refinement round re-scans this 2-column projection
    // (up to 7 map-side aggregate passes); at memory pressure the blocks
    // spill instead of re-reading + re-projecting the source
    val base = data.select(col(groupCol).cast("string").as("g"),
      col(valueCol).cast("long").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      kthSmallestOn(base, groupCol, valueCol, kOfN, shiftStep)
    } finally {
      base.unpersist()
    }
  }

  /** Several order statistics per group over ONE persisted projection:
    * each function in `kOfNs` yields one (group, value) frame, all
    * sharing the same cached 2-column base — the refinement passes
    * re-scan memory, not the source. (q121 needs two tercile ranks;
    * calling [[kthSmallest]] twice re-projects and re-persists the
    * stacked relation for each.) Results are materialized before the
    * base unpersists — each returned frame is a driver-literal. */
  def kthSmallestRanks(data: DataFrame, groupCol: String, valueCol: String,
                       kOfNs: Seq[Long => Long],
                       shiftStep: Int = 10): Seq[DataFrame] = {
    val base = data.select(col(groupCol).cast("string").as("g"),
      col(valueCol).cast("long").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      kOfNs.map(k => kthSmallestOn(base, groupCol, valueCol, k, shiftStep))
    } finally {
      base.unpersist()
    }
  }

  private def kthSmallestOn(base: DataFrame, groupCol: String, valueCol: String,
                            kOfN: Long => Long, shiftStep: Int): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    val init = base.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), min(col("v")).as("lo"), max(col("v")).as("hi"))
      .collect()
    // empty input: no groups, empty result — not an opaque empty.min crash
    if (init.isEmpty)
      return Seq.empty[(String, Long)].toDF(groupCol, valueCol)
    // misuse must fail HERE with a named group, not several distributed
    // passes later as an opaque 'selection invariant broken' (ADVICE r6);
    // a null group key would also NPE at getString below
    init.foreach { r =>
      require(!r.isNullAt(0),
        s"kthSmallest: null $groupCol group — filter or coalesce it first")
      val (g, n) = (r.getString(0), r.getLong(1))
      val kk = kOfN(n)
      require(kk >= 1 && kk <= n,
        s"kthSmallest: kOfN($n) = $kk out of [1, $n] for group '$g'")
    }
    var k: Map[String, Long] = init
      .map(r => r.getString(0) -> kOfN(r.getLong(1))).toMap
    val (gmin, gmax) = (init.map(_.getLong(2)).min, init.map(_.getLong(3)).max)
    // prefix(g) = the value's high bits fixed so far, at `prevShift`
    var prefix: Map[String, Long] = Map.empty
    var prevShift = 64
    var shift = 64 - shiftStep
    // skip rounds whose shift can't split the data: when min and max
    // share the prefix at `shift`, every value does (shifts are
    // monotone), so the histogram would be one bucket per group — for
    // money-like domains this removes ~3 of the 7 passes
    while (shift > 0 && (gmin >> shift) == (gmax >> shift))
      shift -= shiftStep
    var result: Map[String, Long] = Map.empty
    while (result.size < k.size) {
      val cur = math.max(shift, 0)
      val hist =
        (if (prevShift >= 64) base
         else {
           val pre = prefix.toSeq.toDF("g", "p")
           base.join(broadcast(pre), Seq("g"))
             .filter(shiftright(col("v"), prevShift) === col("p"))
         })
          .groupBy(col("g"), shiftright(col("v"), cur).as("b"))
          .agg(count(lit(1)).as("cnt"))
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
          .groupBy(_._1)
      val chosen = k.keys.filterNot(result.contains).map { g =>
        val byBucket = hist(g).map(t => t._2 -> t._3).sortBy(_._1)
        var rem = k(g)
        var pick = Option.empty[Long]
        val it = byBucket.iterator
        while (pick.isEmpty && it.hasNext) {
          val (b, c) = it.next()
          if (rem <= c) pick = Some(b) else rem -= c
        }
        (g, pick.getOrElse(
          throw new IllegalStateException(s"selection invariant broken: $g")), rem)
      }
      if (cur == 0) result = chosen.map(t => t._1 -> t._2).toMap
      else {
        prefix = chosen.map(t => t._1 -> t._2).toMap
        k = chosen.map(t => t._1 -> t._3).toMap
      }
      prevShift = cur
      shift = cur - shiftStep
    }
    result.toSeq.toDF(groupCol, valueCol)
  }

  /** Exact lower median per group: k = (n + 1) / 2. */
  def median(data: DataFrame, groupCol: String, valueCol: String): DataFrame =
    kthSmallest(data, groupCol, valueCol, n => (n + 1) / 2)
}
