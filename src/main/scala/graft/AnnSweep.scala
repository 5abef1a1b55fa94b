package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q106 tuning sweep (r7 verdict task #3): planes × probeFlips frontier
  * for the LSH kNN join — mean recall@k against the exact q92 join,
  * wall seconds, and candidate-pair volume per configuration. The
  * registered q93/q106 configuration is picked from this table (recall
  * target ≥ 0.8). Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt 'runMain graft.AnnSweep'
  * Dev tooling (PERF.md evidence), not part of the driver contract. */
object AnnSweep {
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
    val emb = graft.sources.Tables.embeddings(spark, sfDir).cache()
    val n = emb.count()
    println(s"[ann-sweep] $n vectors from $sfDir")
    // the REGISTERED configuration (r8 verdict task #1): planes derived
    // from the corpus count by planesFor, flips = 2 — this line is the
    // recall certificate for whatever corpus size the sweep runs over
    val dPlanes = graft.operators.AnnQueries.planesFor(n)
    val t0d = System.nanoTime()
    val recD = graft.operators.AnnQueries
      .knnRecall(emb, k = 3, planes = dPlanes, probeFlips = 2)
      .agg(avg(col("recall")).as("mean_recall"),
        sum(col("n_hit")).as("hits"), sum(col("n_exact")).as("exact"))
      .head()
    println(f"[ann-sweep] DERIVED planes=$dPlanes%2d (n=$n) flips=2 " +
      f"mean_recall=${recD.getDouble(0)}%.3f " +
      f"hits=${recD.getLong(1)}/${recD.getLong(2)} " +
      f"wall=${(System.nanoTime() - t0d) / 1e9}%.1f s")
    // full planes x flips frontier only on request: the exact yardstick
    // join inside knnRecall is quadratic, so 10 configurations at a
    // 10x corpus is an hour-class run
    val full = sys.env.get("SPARK_GRAFT_SWEEP_FULL").contains("1")
    for (planes <- Seq(4, 6, 8, 10, 12) if full; flips <- Seq(1, 2)) {
      val t0 = System.nanoTime()
      val rec = graft.operators.AnnQueries
        .knnRecall(emb, k = 3, planes = planes, probeFlips = flips)
        .agg(avg(col("recall")).as("mean_recall"),
          sum(col("n_hit")).as("hits"), sum(col("n_exact")).as("exact"))
        .head()
      val wall = (System.nanoTime() - t0) / 1e9
      // candidate volume of the approx side alone (the exact side is the
      // sweep's fixed yardstick): pairs sharing a probe bucket
      val t1 = System.nanoTime()
      val cands = graft.operators.AnnQueries
        .knnJoinLsh(emb, k = 3, planes = planes,
          signatures = graft.operators.AnnQueries.signSignaturesPortable,
          probeFlips = flips)
        .count()
      val lshWall = (System.nanoTime() - t1) / 1e9
      println(f"[ann-sweep] planes=$planes%2d flips=$flips " +
        f"mean_recall=${rec.getDouble(0)}%.3f " +
        f"hits=${rec.getLong(1)}/${rec.getLong(2)} " +
        f"recall_wall=$wall%.1f s lsh_rows=$cands lsh_wall=$lshWall%.1f s")
    }
    spark.stop()
  }
}
