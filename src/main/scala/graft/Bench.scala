package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric":...,"queries":{...}}. A warmup pass
  * (table counts + one cheap query) precedes timing so the numbers measure
  * steady-state execution, not JIT/codegen/parquet-footer warmup. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      // Scale-adaptive reduce-side width (r11 verdict task #1, guide
      // §2.5/§5): let AQE PLAN every exchange 8× wider than the core
      // count and coalesce back by measured size (parallelismFirst
      // keeps ≥ core-count partitions on small shuffles). At high task
      // concurrency this bounds per-task sort/agg/join buffers — the
      // r11 driver measured the similarity battery collapsing at
      // local[32] (q48 497 s at 32 threads vs 4.1 s at 8: 32 concurrent
      // corpus/32-sized buffers thrashing a fixed heap) while the same
      // code was healthy at 8 threads; width that tracks $SPARK_GRAFT_CPUS
      // shrinks per-task state exactly when concurrency grows. Env-
      // overridable for A/B (SPARK_GRAFT_INIT_PARTS); the timed
      // protocol is untouched.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INIT_PARTS", (cpus.toInt * 8).toString))
      .config("spark.sql.session.timeZone", "UTC")
      // NOTE (r6, measured): the bench tables are one compact parquet
      // file each, so the 4 MB open-cost floor caps e.g. the 6 MB
      // documents file at ~2 input splits. Lowering openCostInBytes to
      // 64 KB to widen the map side was A/B-tested and REGRESSED the
      // full registry 86.5 s -> 109.7 s at sf0.1 — scheduling + shuffle
      // file overhead of 32-way tiny map tasks outweighs the extra
      // width at these input sizes. Real corpora arrive as many files
      // (the 10x probe generator shards per copy), which widens scans
      // without the per-task overhead; defaults kept.
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: touch every table once, run one windowed query end to end
    Seq("lineitem", "orders", "customer", "supplier", "part", "nation",
      "region", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").count()
    }
    graft.sources.Tables.events(spark, sfDir).count()
    try SparkEntry.queries("q09_latest_event_per_user")(spark, sfDir).count()
    catch { case _: Throwable => }
    // dev loop: SPARK_GRAFT_ONLY=q48,q52 times just those queries
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val picked = only.fold(SparkEntry.queries) { sel =>
      SparkEntry.queries.filter { case (n, _) => sel.exists(n.startsWith) }
    }
    // Isolation mode (r11 verdict task #2): the shared-relation memo
    // makes a consumer's bench number its MARGINAL cost after some
    // payer built the relation — the right number for the registry
    // workload, but it hides standalone regressions behind cache hits.
    // SPARK_GRAFT_ISOLATE=1 clears every plan-keyed memo (shared pair
    // cache + the bpe slot it now covers) BEFORE each timed query, so
    // each query pays its own builds inside its own timed region —
    // standalone cost. The clear runs OUTSIDE the timed window (it is
    // bookkeeping: unpersist + deferred checkpoint-dir deletion, not
    // query work). Default off: the driver's shared-mode protocol and
    // its round-over-round comparison are unchanged.
    val isolate = sys.env.get("SPARK_GRAFT_ISOLATE").contains("1")
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      if (isolate) graft.operators.DedupQueries.clearSharedPairCache()
      val t0 = System.nanoTime()
      // materialize the query's OWN plan (toRdd), not count() on top of
      // it: a count-driven Aggregate lets Catalyst prune every projected
      // column and eliminate the final sort, so scalar-heavy queries
      // would time the scan only (r5: q33's fingerprints were never
      // computed under count()). toRdd evaluates all output columns and
      // the ordering — what a consumer of the query actually pays.
      try { fn(spark, sfDir).queryExecution.toRdd.count() }
      catch { case _: Throwable => -1L }
      // the query's action is complete: retire any one-shot reliable
      // checkpoints its plan materialized (no-op without a checkpoint
      // dir; the timed action has already consumed the plan)
      graft.operators.Checkpoints.releaseOneShots()
      (System.nanoTime() - t0) / 1e9
    }
    // Variance protocol (r6 verdict: ±30% per-query / 2.3x whole-run
    // swings between identical runs make single-run numbers
    // unfalsifiable). SPARK_GRAFT_REPS=N (default 1) times every query N
    // times in INTERLEAVED rounds — round-robin over the whole registry,
    // repeated — so slow VM phases (CPU steal, GC pressure) spread across
    // all queries instead of biasing whichever ran during the bad
    // minutes; an A/B of two shapes is two registry entries adjacent in
    // the same rounds. With N >= 2 the headline per-query number is the
    // MEDIAN and a "spread" map carries [min, max]; PERF claims compare
    // medians.
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "1").toInt
    // persisted-store init OUTSIDE the timed loop (r10 verdict task #3):
    // the probe-only faces (q138) measure the per-query-batch cost of a
    // deployment that wrote its index once per corpus snapshot; the
    // one-time build is not part of any query's price. Idempotent —
    // a pre-existing store costs one marker read.
    val tInit = System.nanoTime()
    try SparkEntry.initStores(spark, sfDir)
    catch { case e: Throwable =>
      System.err.println(s"[bench] store init failed: ${e.getMessage}") }
    System.err.println(f"[bench] store init ${(System.nanoTime() - tInit) / 1e9}%.1f s")
    val ordered = picked.toSeq.sortBy(_._1)
    val samples: Map[String, Seq[Double]] =
      (1 to reps).flatMap(_ => ordered.map { case (n, fn) => n -> timeOnce(fn) })
        .groupBy(_._1).map { case (n, ts) => n -> ts.map(_._2).sorted }
    def median(ts: Seq[Double]): Double =
      if (ts.size % 2 == 1) ts(ts.size / 2) else (ts(ts.size / 2 - 1) + ts(ts.size / 2)) / 2
    val results = ordered.map { case (n, _) => n -> median(samples(n)) }
    // r9 verdict task #7: the driver's BENCH_rN.json tail truncates long
    // stdout lines, leaving an artifact that does not parse standalone.
    // Print per-query medians at millisecond precision (plenty for PERF
    // comparisons; ~3 KB for the full registry, inside the tail window)
    // and keep the spread map in the committed full-map FILE only.
    // Locale.ROOT: the f-interpolator honors the JVM default locale, so
    // a comma-decimal locale would emit invalid JSON (r10 review)
    def ms(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    val spread =
      if (reps < 2) ""
      else results.map { case (k, _) =>
        s"\"" + k + "\":[" + ms(samples(k).head) + "," +
          ms(samples(k).last) + "]"
      }.mkString(""","spread":{""", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // second pass with the count() action rounds r1-r4 used: count-driven
    // aggregation lets Catalyst prune projections and final sorts, so this
    // measures LESS work — it was reported alongside for cross-round
    // comparability only (see PERF.md "Bench honesty fix"). r11
    // measurement fix (OPTIMIZATION_r11.md): the pass DOUBLES the wall
    // clock of a reps=1 run (the driver's protocol: 483 s of metric,
    // ~340 s of count pass in r10) while contributing nothing to the
    // reported metric — the r1-r4 numbers it existed to compare against
    // are seven rounds stale. Now opt-in via SPARK_GRAFT_COUNT_PASS=1;
    // the JSON key stays (-1.0 when skipped) so the line schema is
    // unchanged.
    val countPass = sys.env.get("SPARK_GRAFT_COUNT_PASS").contains("1")
    val countTotal = if (reps > 1 || !countPass) -1.0
    else picked.toSeq.sortBy(_._1).map { case (_, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      (System.nanoTime() - t0) / 1e9
    }.sum
    // full_map_file leads the object: the driver's BENCH_rN.json tail
    // truncates long lines, so the pointer to the COMPLETE committed
    // map must sit in the part that survives truncation
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json")
    // stdout: rounded medians, NO spread map — short enough to survive
    // the driver's tail window and parse standalone
    println(s"""{"metric":"total","value":$total,"unit":"sec","full_map_file":"$outPath","action":"toRdd","reps":$reps,"count_action_total":$countTotal,"queries":$qs,"sf":"$sfDir"}""")
    // the committed full map (bench_full_rN.json) carries the spread
    // map too — the per-query [min, max] PERF claims cite
    val line = s"""{"metric":"total","value":$total,"unit":"sec","full_map_file":"$outPath","action":"toRdd","reps":$reps,"count_action_total":$countTotal,"queries":$qs$spread,"sf":"$sfDir"}"""
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), line + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}") }
    // r10 verdict task #4: the driver's tail window truncated the full
    // per-query line three rounds running, leaving BENCH_rN.json with
    // "parsed": null. Emit a LAST compact line (≤1.5 KB regardless of
    // registry size) that always json-loads standalone: total, sf,
    // reps, the committed full-map pointer and its md5 so the tail is
    // verifiably tied to the complete map.
    val mapMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    println(s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","reps":$reps,"n_queries":${results.size},"full_map_file":"$outPath","full_map_md5":"$mapMd5"}""")
    spark.stop()
  }
}
