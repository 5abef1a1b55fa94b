package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling probe for q80's incremental-dedup cost shape (the r7 verdict
  * task): does the per-batch wall track the BATCH, or the corpus pair
  * volume? Times three formulations over a deterministic corpus at
  * existing = E and existing = 10·E with the SAME incoming batch:
  *
  *  - probe one-pass: [[graft.operators.CurationQueries.incrementalDedup]]
  *    (index built in-pass — linear in E — then probe-only candidates);
  *  - union shape: [[graft.operators.CurationQueries.incrementalDedupUnionShape]]
  *    (the r7 `weak` plan whose candidate volume tracks the union's
  *    pair density);
  *  - persisted probe: [[graft.operators.DedupQueries.prefixProbeJoin]]
  *    against a PrefixIndex already materialized to parquet — the true
  *    per-batch cost of a deployed incremental screen (the index build
  *    amortizes over every batch that probes it).
  *
  * Corpus: 60-token docs over a 20k vocabulary in 20-doc clusters, one
  * planted near-dup per cluster (existing-existing pair volume grows
  * linearly with E — the volume the probe shape must NOT pay); the
  * batch draws half exact / half near copies from a FIXED 1000-cluster
  * slice plus fresh content, so the true cross-match count is
  * independent of E by construction.
  *
  * Run: SPARK_GRAFT_EXISTING=50000 SPARK_GRAFT_INCOMING=5000 \
  *        sbt 'runMain graft.IncrementalBench'
  * Dev tooling (PERF.md evidence), not part of the registry. */
object IncrementalBench {

  /** [[BenchCorpus.zipfText]] — the shared cubed-uniform profile;
    * `variant` swaps token 7, making a near-dup of the cluster head. */
  private def textFor(cluster: Column, variant: Column): Column =
    BenchCorpus.zipfText(cluster, variant)

  def main(args: Array[String]): Unit = {
    val e0 = sys.env.getOrElse("SPARK_GRAFT_EXISTING", "50000").toLong
    val nIn = sys.env.getOrElse("SPARK_GRAFT_INCOMING", "5000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // one planted near-dup PAIR per 20-doc cluster (head + variant);
    // the other 18 docs carry unique content — existing-existing true
    // pair volume grows linearly in E, like a real curated corpus
    def existingOf(n: Long): DataFrame = {
      val cluster = (col("id") / 20).cast("long")
      spark.range(n).select(col("id").as("doc_id"),
        when(col("id") % 20 === 0, textFor(cluster, lit(null).cast("long")))
          .when(col("id") % 20 === 1, textFor(cluster, cluster + 1000000L))
          .otherwise(textFor(col("id") + 7000000L, lit(null).cast("long")))
          .as("text"))
    }
    // batch content pinned to clusters [0, 1000): cross matches do not
    // grow with E; ids offset into their own namespace
    val incoming = spark.range(nIn)
      .select((col("id") + 50000000L).as("doc_id"),
        when(col("id") % 5 === 4,
          textFor(col("id") + 3000000L, lit(null).cast("long")))
          .otherwise(textFor(col("id") % 1000,
            when(col("id") % 2 === 0, col("id") % 1000 + 2000000L)))
          .as("text"))
      .cache()
    incoming.count()

    def time(name: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[inc-bench] $name: $s%.1f s ($n rows)")
      s
    }

    import graft.operators.{CurationQueries, DedupQueries}
    // SPARK_GRAFT_MULTS="" skips the batch-shape comparisons (e.g. a
    // stream-maintenance-only run)
    val mults = sys.env.getOrElse("SPARK_GRAFT_MULTS", "1,10")
      .split(",").map(_.trim).filter(_.nonEmpty).map(_.toLong).toSeq
    for (mult <- mults) {
      val ne = e0 * mult
      val existing = existingOf(ne).cache()
      existing.count()
      println(s"[inc-bench] === existing=$ne incoming=$nIn ===")
      time(s"probe one-pass  E=$ne") {
        CurationQueries.incrementalDedup(existing, incoming, 0.8, 4096).count()
      }
      time(s"union shape     E=$ne") {
        CurationQueries.incrementalDedupUnionShape(
          existing, incoming, 0.8, 4096).count()
      }
      // persisted-index variant: the index is parquet on disk (built +
      // written once per corpus snapshot); per-batch cost = read + probe.
      // SPARK_GRAFT_PERSISTED=0 skips it (large-E runs under a timeout).
      if (sys.env.getOrElse("SPARK_GRAFT_PERSISTED", "1") == "0") {
        existing.unpersist(); ()
      } else {
      val dir = java.nio.file.Files.createTempDirectory("graft-incidx").toString
      val arrs = existing.select(col("doc_id"), lit("all").as("source"),
        array_distinct(split(col("text"), " ")).as("sh"))
      val built = DedupQueries.buildPrefixIndex(arrs, 0.8)
      built.freq.write.mode("overwrite").parquet(s"$dir/freq")
      built.entries.write.mode("overwrite").parquet(s"$dir/entries")
      built.arrays.write.mode("overwrite").parquet(s"$dir/arrays")
      val loaded = DedupQueries.PrefixIndex(
        spark.read.parquet(s"$dir/freq"),
        spark.read.parquet(s"$dir/entries"),
        spark.read.parquet(s"$dir/arrays"))
      val inArrs = incoming.select(col("doc_id"), lit("all").as("source"),
        array_distinct(split(col("text"), " ")).as("sh"))
      time(s"persisted probe E=$ne") {
        DedupQueries.prefixProbeJoin(loaded, inArrs, 0.8, 4096).count()
      }
      existing.unpersist()
      }
    }

    // ── streaming-maintenance probe (r8 verdict task #4): feed
    // SPARK_GRAFT_STREAM_BATCHES micro-batches through
    // DocStream.prefixIndexSink over a persisted base index and time
    // each — the claim under test is that per-batch cost stays FLAT as
    // accepted deltas accumulate (each batch pays its own probe +
    // delta writes, never an index rebuild). Batch k mixes near-dups
    // of the base (rejected) with fresh per-batch content (accepted,
    // so the maintained index genuinely grows across batches). ──
    val streamBatches =
      sys.env.getOrElse("SPARK_GRAFT_STREAM_BATCHES", "0").toInt
    if (streamBatches > 0) {
      val ne = e0
      val existing = existingOf(ne)
      val dir = java.nio.file.Files
        .createTempDirectory("graft-prefix-stream-bench")
        .resolve("ix").toString
      val t0 = System.nanoTime()
      graft.streaming.DocStream.initPrefixIndexStore(existing, dir, 0.8)
      println(f"[inc-bench] stream init: base E=$ne built+written in " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")
      // SPARK_GRAFT_BLOOM_SCREEN=0 turns the sink's lossless bloom
      // pre-screen off (r10 verdict task #1); =ab INTERLEAVES screened
      // and unscreened sinks over twin stores fed identical batches —
      // the only drift-proof comparison on this throttling VM (see
      // PERF.md's variance protocol)
      val screenMode = sys.env.getOrElse("SPARK_GRAFT_BLOOM_SCREEN", "1")
      def batchFor(k: Int) = spark.range(nIn)
        .select((col("id") + 60000000L + k * 1000000L).as("doc_id"),
          when(col("id") % 5 === 4, // base near-dup: rejected
            textFor(col("id") % 1000, col("id") % 1000 + 2000000L))
            .otherwise( // fresh per-batch namespace: accepted
              textFor(col("id") + 8000000L + k * 1000000L,
                lit(null).cast("long")))
            .as("text"))
      if (screenMode == "ab") {
        val dirB = dir + "-b"
        graft.streaming.DocStream.initPrefixIndexStore(existing, dirB, 0.8)
        val sinks = Seq(
          "screen=on " ->
            graft.streaming.DocStream.prefixIndexSink(dir, 0.8),
          "screen=off" ->
            graft.streaming.DocStream.prefixIndexSink(dirB, 0.8,
              bloomScreen = false))
        (0 until streamBatches).foreach { k =>
          val batch = batchFor(k)
          sinks.foreach { case (name, sink) =>
            val tb = System.nanoTime()
            sink(batch, k.toLong)
            println(f"[inc-bench] stream batch $k%2d $name: " +
              f"${(System.nanoTime() - tb) / 1e9}%.1f s")
          }
        }
      } else {
        val sink = graft.streaming.DocStream.prefixIndexSink(dir, 0.8,
          bloomScreen = screenMode != "0")
        (0 until streamBatches).foreach { k =>
          val batch = batchFor(k)
          val tb = System.nanoTime()
          sink(batch, k.toLong)
          println(f"[inc-bench] stream batch $k%2d: " +
            f"${(System.nanoTime() - tb) / 1e9}%.1f s")
        }
      }
    }
    spark.stop()
  }
}
