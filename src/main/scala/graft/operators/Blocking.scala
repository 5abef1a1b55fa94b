package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Triangle-blocked all-pairs self-join cover (the self-join instance of
  * Okcan & Riedewald's 1-Bucket-Theta grid, SIGMOD 2011).
  *
  * A group-keyed all-pairs self-join (`a.join(b, groupCols)`) parallelizes
  * only by the number of GROUPS: five sources → five tasks, regardless of
  * cluster size, and each task is quadratic in its block. Blocking fixes
  * the shape: rows hash into `blocks` buckets by id, and each unordered
  * bucket pair (i ≤ j) becomes one join key — groups × B(B+1)/2 tasks,
  * each quadratic only in 1/B² of the block.
  *
  * Cover construction: a row in bucket r enters the LEFT side under keys
  * (i = r, j ∈ [r, B)) and the RIGHT side under keys (j = r, i ∈ [0, r]).
  * For ids x ∈ bucket r₁, y ∈ bucket r₂ with r₁ < r₂ the pair meets at
  * exactly key (r₁, r₂) (x left, y right); r₁ > r₂ symmetrically at
  * (r₂, r₁); r₁ = r₂ meets twice on the diagonal key — once per order —
  * so the pair predicate keeps diagonal rows only when id_left < id_right:
  *
  *   pairs = left.join(right, groupCols :+ "__bi" :+ "__bj")
  *     .filter(col("__bi") < col("__bj") || leftId < rightId)
  *
  * and every unordered pair survives EXACTLY once (cross-bucket rows may
  * arrive with ids in either order — canonicalize with least/greatest
  * BEFORE any id1 < id2 output convention). Replication factor per side
  * averages (B+1)/2 — the classic memory-for-parallelism trade; B=8
  * multiplies data ~4.5× per side and task count by 36.
  */
object Blocking {

  /** Left/right covers of `df` for a triangle-blocked self-join.
    * `id` must be a deterministic per-row column (the pair identity);
    * callers rename payload columns per side as usual, join on
    * `groupCols ++ Seq("__bi", "__bj")`, and apply [[pairPredicate]]. */
  def triangleSides(df: DataFrame, id: Column, blocks: Int)
  : (DataFrame, DataFrame) = {
    val r = pmod(xxhash64(id), lit(blocks)).cast("int")
    val left = df
      .withColumn("__bi", r)
      .withColumn("__bj", explode(sequence(col("__bi"), lit(blocks - 1))))
    val right = df
      .withColumn("__bj", r)
      .withColumn("__bi", explode(sequence(lit(0), col("__bj"))))
    (left, right)
  }

  /** Keep each unordered pair exactly once (see cover proof above). */
  def pairPredicate(leftId: Column, rightId: Column): Column =
    col("__bi") < col("__bj") || leftId < rightId

  /** Block count sized to the (largest) group: ⌈rows / targetPerBucket⌉,
    * capped. Blocking is a memory-for-parallelism trade — each side
    * replicates ~(B+1)/2× and task count multiplies by B(B+1)/2 — so a
    * group that already fits one bucket should pay B=1 (no replication,
    * the plain join), while a large stratum scales B up until each
    * bucket-pair task compares ~targetPerBucket² candidates. Callers
    * that know their stratum sizes (or count them in a first pass) pass
    * the result to the `blocks` parameter; the registered queries keep a
    * fixed default so their plans stay comparable across rounds. */
  def blocksFor(groupRows: Long, targetPerBucket: Long = 2048,
                maxBlocks: Int = 64): Int = {
    require(targetPerBucket >= 1 && maxBlocks >= 1)
    val b = (groupRows + targetPerBucket - 1) / targetPerBucket
    math.max(1, math.min(b, maxBlocks.toLong)).toInt
  }
}
