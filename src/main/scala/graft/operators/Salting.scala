package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew tooling for heavy-hitter join keys (SURVEY §4 "parallelism" /
  * PERF.md skew note). AQE's skew-join split handles sort-merge skew at
  * runtime; explicit salting is still the right tool when one side can be
  * replicated and the skew is known ahead (e.g. a degenerate corpus where
  * half the documents share one LSH bucket).
  *
  * `saltedJoin` replicates the build side `salt` ways and deterministically
  * scatters the probe side with a content hash — results are identical to
  * the plain join (spec-verified), only the partitioning changes. */
object Salting {

  /** Inner-join `probe ⋈ build` on `keys`, with `build` replicated
    * `salt`-ways and `probe` scattered by a deterministic hash of
    * `scatterCols` (NOT rand(): resubmitted tasks must re-derive the same
    * salt or retries produce duplicates). */
  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
                 scatterCols: Seq[Column], salt: Int): DataFrame = {
    val saltedProbe = probe.withColumn("__salt",
      pmod(xxhash64(scatterCols: _*), lit(salt)).cast("int"))
    val saltedBuild = build.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedProbe.join(saltedBuild, keys :+ "__salt").drop("__salt")
  }
}
