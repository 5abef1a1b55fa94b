package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streamed-ANN-store maintenance probe: measures the
  * [[graft.streaming.AnnStream]] deployment loop — per-batch sink cost
  * (must stay FLAT as batches accumulate: the sink reads two markers,
  * signs its own batch under the frozen planes and writes two delta
  * partitions, never touching prior batches), load + probe wall before
  * and after compaction, and the plane re-derivation (base freezes
  * `planesFor(base)`; compaction re-freezes at `planesFor(total)` —
  * the occupancy re-fit that keeps probe candidate volume linear in n).
  *
  * Vectors are deterministic 16-dim cluster + noise (cluster direction
  * from a hash of id % clusters, per-id perturbation), so sign-LSH
  * buckets have realistic skew. Query ids sit at +10⁹ — disjoint from
  * the index namespace per the knnProbeLsh ID CONTRACT.
  *
  * `SPARK_GRAFT_AUTO_EVERY=N` (r9 verdict task #1) switches to the
  * AUTO-compaction steady-state protocol: the sink carries
  * `autoCompactEvery = N`, no manual compaction call is made, and the
  * probe reports per-batch wall deciles + the final base version — a
  * 500+-batch run bounded by the cadence alone.
  *
  * Run: SPARK_GRAFT_VECS=200000 SPARK_GRAFT_BATCHES=20 \
  *   sbt 'runMain graft.AnnStoreBench'
  * Steady state: SPARK_GRAFT_VECS=200000 SPARK_GRAFT_BATCHES=500 \
  *   SPARK_GRAFT_AUTO_EVERY=50 sbt 'runMain graft.AnnStoreBench'
  * Dev tooling (PERF.md evidence), not part of the driver contract. */
object AnnStoreBench {
  def main(args: Array[String]): Unit = {
    val nVecs = sys.env.getOrElse("SPARK_GRAFT_VECS", "200000").toLong
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_BATCHES", "20").toInt
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
    import graft.streaming.{AnnStream, DocStream}

    def vecsOf(ids: org.apache.spark.sql.DataFrame) = ids.select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(15)), d => {
        val cl = (pmod(xxhash64(pmod(col("id"), lit(256L)), d),
          lit(2001L)).cast("double") / 1000.0 - 1.0) // cluster direction
        val nz = (pmod(xxhash64(col("id"), d, lit(7L)),
          lit(2001L)).cast("double") / 1000.0 - 1.0) // per-id noise
        (cl + nz * 0.1).cast("float")
      }).as("embedding"))

    val half = nVecs / 2
    val base = vecsOf(spark.range(half).toDF())
    val rest = vecsOf(spark.range(half, nVecs).toDF())
    val path = java.nio.file.Files.createTempDirectory("graft-ann-store")
      .resolve("ix").toString
    val t0 = System.nanoTime()
    AnnStream.initAnnIndexStore(base, path)
    println(f"[ann-store] base $half vecs, planes " +
      s"${AnnStream.loadStreamedAnnIndex(spark, path).planes}, " +
      f"build ${(System.nanoTime() - t0) / 1e9}%.1f s")

    val sink = AnnStream.annIndexSink(path, autoCompactEvery = autoEvery)
    val per = math.max(1L, (nVecs - half) / nBatches)
    val walls = (0 until nBatches).map { b =>
      val lo = half + b * per
      val hi = if (b == nBatches - 1) nVecs else lo + per
      val t = System.nanoTime()
      sink(rest.filter(col("vec_id") >= lo && col("vec_id") < hi), b.toLong)
      (System.nanoTime() - t) / 1e9
    }
    println(f"[ann-store] $nBatches batches of ~$per: per-batch walls " +
      s"first3=${walls.take(3).map(w => f"$w%.1f").mkString(",")} " +
      s"last3=${walls.takeRight(3).map(w => f"$w%.1f").mkString(",")} " +
      f"(median ${walls.sorted.apply(nBatches / 2)}%.1f s)")
    if (autoEvery > 0) {
      def med(w: Seq[Double]) = w.sorted.apply(w.size / 2)
      val dec = math.max(1, nBatches / 10)
      println(f"[ann-store] auto-cadence $autoEvery: per-batch wall " +
        f"median first-decile ${med(walls.take(dec))}%.2f s, " +
        f"middle ${med(walls.slice(nBatches / 2 - dec / 2, nBatches / 2 + dec / 2 + 1))}%.2f s, " +
        f"last ${med(walls.takeRight(dec))}%.2f s, max ${walls.max}%.2f s; " +
        "base version " +
        s"${DocStream.readLongMarker(spark, path, "_base_version").getOrElse(0L)}")
    }

    val queries = vecsOf(spark.range(1000000000L, 1000000500L).toDF())
    def probeWall(): Double = {
      val ws = (0 until 3).map { _ =>
        val t = System.nanoTime()
        AnnStream.knnProbe(
          AnnStream.loadStreamedAnnIndex(spark, path), queries, k = 3,
          probeFlips = 2).count()
        (System.nanoTime() - t) / 1e9
      }
      ws.sorted.apply(1)
    }
    if (autoEvery > 0) {
      // no manual compaction: the cadence's steady state is the result
      println(f"[ann-store] steady state: load+probe(500q,flips2) median " +
        f"${probeWall()}%.1f s; planes " +
        s"${AnnStream.loadStreamedAnnIndex(spark, path).planes} " +
        "(no manual compaction call in the whole run)")
    } else {
      val before = probeWall()
      val tc = System.nanoTime()
      AnnStream.compactAnnIndexStore(spark, path)
      val compactWall = (System.nanoTime() - tc) / 1e9
      val after = probeWall()
      println(f"[ann-store] load+probe(500q,flips2) median $before%.1f -> " +
        f"$after%.1f s; compaction $compactWall%.1f s; planes now " +
        s"${AnnStream.loadStreamedAnnIndex(spark, path).planes}")
    }
    spark.stop()
  }
}
