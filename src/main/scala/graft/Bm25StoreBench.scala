package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streamed-BM25-store compaction probe: measures what
  * [[graft.streaming.DocStream.compactBm25Index]]'s posting
  * consolidation buys after `SPARK_GRAFT_BATCHES` micro-batches have
  * each left their own tf/dfd/tot partitions — the small-files
  * accumulation a long-running stream produces. Reports, before and
  * after compaction: data files on disk, and the wall of a full
  * load + query-batch scoring pass (median of 3). The corpus/query
  * shape is RetrievalBench's open-vocabulary profile so posting lists
  * have realistic skew.
  *
  * `SPARK_GRAFT_AUTO_EVERY=N` (r9 verdict task #1) switches to the
  * AUTO-compaction steady-state protocol: the sink carries
  * `autoCompactEvery = N`, NO manual compaction call is ever made, and
  * the probe reports per-batch wall medians over the first/middle/last
  * deciles plus load wall and file count at the end — the evidence
  * that a 500+-batch run stays bounded under the cadence alone.
  *
  * Run: SPARK_GRAFT_DOCS=100000 SPARK_GRAFT_BATCHES=50 \
  *   sbt 'runMain graft.Bm25StoreBench'
  * Steady state: SPARK_GRAFT_DOCS=50000 SPARK_GRAFT_BATCHES=500 \
  *   SPARK_GRAFT_AUTO_EVERY=25 sbt 'runMain graft.Bm25StoreBench'
  * Dev tooling (PERF.md evidence), not part of the driver contract. */
object Bm25StoreBench {
  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_DOCS", "100000").toLong
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_BATCHES", "50").toInt
    val autoEvery = sys.env.getOrElse("SPARK_GRAFT_AUTO_EVERY", "0").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.CurationQueries
    import graft.streaming.DocStream

    val docs = spark.range(nDocs)
      .select(col("id").as("doc_id"), BenchCorpus.zipfText(col("id")).as("text"))
    val path = java.nio.file.Files.createTempDirectory("graft-bm25-store")
      .resolve("ix").toString
    val sink = DocStream.bm25IndexSink(path, autoCompactEvery = autoEvery)
    val per = math.max(1L, nDocs / nBatches)
    val t0 = System.nanoTime()
    val batchWalls = (0 until nBatches).map { b =>
      val t = System.nanoTime()
      sink(docs.filter(col("doc_id") >= b * per &&
        (col("doc_id") < (b + 1) * per || b == nBatches - 1)), b.toLong)
      (System.nanoTime() - t) / 1e9
    }
    println(f"[bm25-store] $nDocs docs in $nBatches batches: " +
      f"ingest ${(System.nanoTime() - t0) / 1e9}%.1f s")
    if (autoEvery > 0) {
      // steady-state evidence: per-batch wall must stay FLAT across the
      // run (deciles), with the cadence absorbing the compaction passes
      def med(w: Seq[Double]) = w.sorted.apply(w.size / 2)
      val dec = math.max(1, nBatches / 10)
      println(f"[bm25-store] auto-cadence $autoEvery: per-batch wall " +
        f"median first-decile ${med(batchWalls.take(dec))}%.2f s, " +
        f"middle ${med(batchWalls.slice(nBatches / 2 - dec / 2, nBatches / 2 + dec / 2 + 1))}%.2f s, " +
        f"last ${med(batchWalls.takeRight(dec))}%.2f s, " +
        f"max ${batchWalls.max}%.2f s (compaction batches); " +
        s"watermark=${DocStream.compactedThrough(spark, path).getOrElse(-1L)}")
    }

    def dataFiles: Long = {
      val root = java.nio.file.Paths.get(path)
      val s = java.nio.file.Files.walk(root)
      try s.filter(p => java.nio.file.Files.isRegularFile(p) &&
        !p.getFileName.toString.startsWith("_") &&
        !p.getFileName.toString.startsWith(".")).count()
      finally s.close()
    }
    def loadScoreWall(): Double = {
      val walls = (0 until 3).map { _ =>
        val t = System.nanoTime()
        val ix = DocStream.loadBm25Index(spark, path)
        val q = CurationQueries.bm25QueryTerms(ix,
          docs.filter(col("doc_id") % 997 === 0))
        CurationQueries.bm25ScoreIndexed(ix, q, k = 5).count()
        (System.nanoTime() - t) / 1e9
      }
      walls.sorted.apply(1)
    }
    if (autoEvery > 0) {
      // no manual compaction anywhere in this path: whatever the
      // cadence left behind is the steady state being graded
      println(f"[bm25-store] steady state after $nBatches batches: " +
        f"data files $dataFiles%d, load+score median ${loadScoreWall()}%.1f s " +
        "(no manual compaction call in the whole run)")
    } else {
      val filesBefore = dataFiles
      val wallBefore = loadScoreWall()
      val tc = System.nanoTime()
      DocStream.compactBm25Index(spark, path)
      val compactWall = (System.nanoTime() - tc) / 1e9
      val filesAfter = dataFiles
      val wallAfter = loadScoreWall()
      println(f"[bm25-store] data files $filesBefore -> $filesAfter; " +
        f"load+score median $wallBefore%.1f -> $wallAfter%.1f s; " +
        f"compaction pass $compactWall%.1f s")
    }
    spark.stop()
  }
}
