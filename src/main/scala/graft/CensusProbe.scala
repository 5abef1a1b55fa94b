package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q110 tail attribution (r8 verdict task #5): the organic 10×→30×
  * exponent measured 1.37 — super-linear but sub-wedge. This probe
  * decomposes the census at a given corpus into
  *   (a) the t = 0.5 prefix-join EDGE BUILD alone,
  *   (b) the full census (edge build + orientation + closing join),
  *   (c) the light-path candidate volume Σ C(nf, 2) over prefix
  *       posting lists (the exact number of within-source candidate
  *       pairs the edge build's equi-join emits — the "candidate tail"
  *       suspect), plus the graph's edge/wedge totals.
  * Run it at two scales and two heaps: if (c) scales linearly while
  * (b) − (a) stays proportional to wedges, the super-linear residual
  * is allocator/spill pressure, not plan shape.
  *
  * Run: SPARK_GRAFT_SF_DIR=/tmp/scale30_organic [SPARK_DRIVER_MEM=48g]
  *        sbt 'runMain graft.CensusProbe'
  * Dev tooling (PERF.md evidence), not part of the driver contract. */
object CensusProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/scale10_organic")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Checkpoints, DedupQueries, PipelineQueries}

    val docs = graft.sources.Tables.documents(spark, sfDir)
    val n = docs.count()
    println(s"[census-probe] $n docs from $sfDir " +
      s"(heap ${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")})")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[census-probe] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s " +
        f"($rows rows)")
      Checkpoints.releaseOneShots()
    }
    // (c) candidate volume of the light equi-join path: per-(source,
    // element) prefix posting lists from the SAME selection the edge
    // build runs (source-blocked, t = 0.5), Σ C(nf, 2)
    val arrs = docs.select(col("doc_id"), col("source"),
      array_distinct(split(col("text"), " ")).as("sh"))
    val idx = DedupQueries.buildPrefixIndex(arrs, 0.5)
    val stats = idx.freq.agg(
      sum(expr("nf * (nf - 1) DIV 2")).cast("long").as("cand_pairs"),
      max(col("nf")).as("max_nf"),
      sum(when(col("nf") >= 4096, 1L).otherwise(0L)).as("n_heavy")).head()
    println(s"[census-probe] light-path candidates=${stats.getLong(0)} " +
      s"max_nf=${stats.getLong(1)} heavy_lists=${stats.getLong(2)}")
    Checkpoints.releaseOneShots()
    time("edge build (tokenPrefixJoin t=0.5)") {
      DedupQueries.tokenPrefixJoin(docs, 0.5, sorted = false).count()
    }
    time("full census (q110)") {
      val r = PipelineQueries.triangleCensus(docs).collect()
      r.foreach(x => println(s"[census-probe]   $x"))
      r.length.toLong
    }
    spark.stop()
  }
}
