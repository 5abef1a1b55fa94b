package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Band-layout sweep for the q128 LSH cluster rung, scored by the q132
  * certificate: for each (bands × rowsPerBand) split of the 16 token
  * minhashes, aggregate doc/token-mass recall vs the exact q125
  * clusters plus the rung's wall — the measurement that picks the
  * registered operating point (per-pair collision 1−(1−sʳ)ᵇ trades
  * recall against candidate volume; only a measured sweep shows where
  * verification cost actually lands on a real corpus).
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   sbt 'runMain graft.ClusterRecallProbe'
  * Dev tooling (PERF.md evidence), not part of the driver contract. */
object ClusterRecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.documents(spark, sfDir)

    // the PERF r10 sweep: same-16-perm splits (4×4 / 5×3 / 8×2 / 16×1
    // — recall FALLS as band keys shorten: coarser buckets break the
    // chains) then constant-width widenings (6×4 / 8×4 — the axis that
    // helps; 8×4 is the registered frontier point). r11 adds the
    // chain-reach axis at the frontier layout (hops 1 vs 2 — the r10
    // verdict task-#5 experiment; SPARK_GRAFT_SWEEP=hops runs only it).
    val sweep: Seq[(Int, Int, Int)] =
      if (sys.env.get("SPARK_GRAFT_SWEEP").contains("hops"))
        Seq((8, 4, 3), (8, 4, 4), (8, 4, 5))
      else Seq((4, 4, 1), (5, 3, 1), (8, 2, 1), (16, 1, 1), (6, 4, 1),
        (8, 4, 1), (8, 4, 2))
    sweep.foreach { case (b, r, h) =>
      val t0 = System.nanoTime()
      val stats = graft.operators.PipelineQueries
        .lshClusterStats(docs, bands = b, rowsPerBand = r, chainHops = h)
        .agg(sum(col("n_docs")), sum(col("total_tokens"))).collect()
      val rungWall = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val rec = graft.operators.PipelineQueries
        .lshClusterRecall(docs, bands = b, rowsPerBand = r, chainHops = h)
        .agg(sum(col("n_docs")).as("docs"),
          sum(col("n_recovered")).as("rec"),
          sum(col("total_tokens")).as("tt"),
          sum(col("recovered_tokens")).as("rt"))
        .collect().head
      val certWall = (System.nanoTime() - t1) / 1e9
      val (nd, nr) = (rec.getLong(0), rec.getLong(1))
      val (tt, rt) = (rec.getLong(2), rec.getLong(3))
      println(f"[cluster-recall] ${b}%2dx$r hops=$h: " +
        f"doc_recall=${nr.toDouble / nd}%.4f " +
        f"token_recall=${rt.toDouble / tt}%.4f " +
        f"rung_wall=$rungWall%.1f s cert_wall=$certWall%.1f s " +
        s"(clustered_docs=${stats.head.getLong(0)})")
      graft.operators.DedupQueries.clearSharedPairCache()
    }
    spark.stop()
  }
}
