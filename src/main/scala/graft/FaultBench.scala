package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Executor-loss probe for the reliable-checkpoint path (r7 verdict
  * stretch #8): the CheckpointCycle machinery's fault-tolerance
  * rationale (Checkpoints.scala — reliable `checkpoint()` when a
  * checkpoint dir is set, so a lost executor restarts the CURRENT
  * round, not round zero) is untestable on local[32], which never
  * loses an executor. This main runs connected components over a
  * `local-cluster[2,1,...]` master — executors are real SEPARATE
  * JVMs — and SIGKILLs one executor mid-iteration; the standalone
  * worker relaunches it and the job must complete with correct output.
  *
  * Run: SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  *   sbt 'runMain graft.FaultBench'      (results recorded in PERF.md;
  * both env vars are needed for local-cluster's worker-launched
  * executor JVMs). Dev tooling — not part of the driver contract. */
object FaultBench {

  /** PIDs of live executor JVMs (children of the in-process workers).
    * Read /proc directly: ProcessHandle.info().commandLine() comes back
    * empty for JVMs launched through @argfiles. */
  private def executorPids(): Seq[Long] = {
    val procs = Option(new java.io.File("/proc")
      .listFiles((f: java.io.File) => f.getName.forall(_.isDigit)))
      .getOrElse(Array.empty)
    procs.toSeq.flatMap { d =>
      try {
        val cmd = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(d.getPath, "cmdline")))
          .replace('\u0000', ' ')
        if (cmd.contains("CoarseGrainedExecutorBackend")) Some(d.getName.toLong)
        else None
      } catch { case _: Throwable => None }
    }
  }

  /** Child modes for phases 3-5 (`<store>-sink-child <storePath>`): run
    * the named store's maintenance sink on two deterministic batches
    * against an already-initialised store. The PARENT SIGKILLs this
    * process while batch 1's delta writes are in flight — a real
    * unclean death of the maintenance process, not a reconstructed
    * disk state. */
  private def sinkChild(mode: String, path: String): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-fault-child")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sink: (org.apache.spark.sql.DataFrame, Long) => Unit = mode match {
      case "prefix-sink-child" =>
        graft.streaming.DocStream.prefixIndexSink(path, 0.5)
      case "bm25-sink-child" =>
        graft.streaming.DocStream.bm25IndexSink(path)
      case "ann-sink-child" =>
        graft.streaming.AnnStream.annIndexSink(path)
    }
    def batch(lo: Long, hi: Long) =
      if (mode == "ann-sink-child") childVecs(spark, lo, hi)
      else childDocs(spark, lo, hi)
    sink(batch(100000L, 102000L), 0L)
    println("[fault-child] batch 0 committed")
    sink(batch(200000L, 204000L), 1L)
    println("[fault-child] batch 1 committed (kill arrived too late)")
    spark.stop()
  }

  /** Deterministic fresh-vocabulary docs — the same relation in child
    * (ingest) and parent (replay/reference), so the replayed batch is
    * bit-identical to the killed one, as foreachBatch redelivery is. */
  private def childDocs(spark: SparkSession, lo: Long, hi: Long) =
    spark.range(lo, hi).toDF("id")
      .select(col("id").as("doc_id"),
        BenchCorpus.zipfText(col("id")).as("text"))

  /** Deterministic 16-dim vectors (hash direction + hash noise — the
    * AnnStoreBench profile), identical across JVMs for the same ids. */
  private def childVecs(spark: SparkSession, lo: Long, hi: Long) =
    spark.range(lo, hi).toDF("id").select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(15)), d => {
        val cl = (pmod(xxhash64(pmod(col("id"), lit(64L)), d),
          lit(2001L)).cast("double") / 1000.0 - 1.0)
        val nz = (pmod(xxhash64(col("id"), d, lit(7L)),
          lit(2001L)).cast("double") / 1000.0 - 1.0)
        (cl + nz * 0.1).cast("float")
      }).as("embedding"))

  /** Launch a `<mode> <storePath>` child JVM, SIGKILL it as soon as
    * batch 1's FIRST delta write commits (`trigger`, relative to the
    * store) — the batch's remaining writes are then in flight or
    * unstarted — and report whether the child had already finished
    * (kill landed too late; the probe still validates the committed
    * path). Bounded wait: a hung child fails the bench. */
  private def killChildMidBatch(mode: String, storePath: String,
                                trigger: String): Boolean = {
    // the child needs the parent's JDK-17 module options (sbt supplies
    // them via forked javaOptions; a bare `java` would fail Spark init)
    import scala.jdk.CollectionConverters._
    val moduleArgs = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments.asScala
      .filter(a => a.startsWith("--add-opens") ||
        a.startsWith("--add-exports") || a.startsWith("--enable-native"))
    val childCmd = Seq(
      s"${sys.props("java.home")}/bin/java") ++ moduleArgs ++ Seq(
      "-Xmx4g", "-cp", sys.props("java.class.path"),
      "graft.FaultBench", mode, storePath)
    val child = new ProcessBuilder(childCmd: _*).inheritIO().start()
    val trig = java.nio.file.Paths.get(storePath, trigger)
    val deadline = System.nanoTime() + 180L * 1000 * 1000 * 1000
    while (child.isAlive && !java.nio.file.Files.exists(trig) &&
      System.nanoTime() < deadline) Thread.sleep(5)
    // decide on the loop's EXIT REASON, sampled once — and destroy the
    // child on EVERY path (a failure abort must not leak a live JVM
    // that keeps mutating the store)
    val triggered = java.nio.file.Files.exists(trig)
    val wasAlive = child.isAlive
    child.destroyForcibly()
    child.waitFor()
    require(triggered || wasAlive,
      s"fault child exited (code ${child.exitValue()}) before batch 1 " +
        "started — launch failure, not a crash probe")
    require(triggered,
      s"fault child hung 180 s before the kill trigger; aborting $mode")
    !wasAlive
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.exists(_.endsWith("-sink-child"))) {
      sinkChild(args(0), args(1)); return
    }
    val spark: SparkSession = SparkSession.builder()
      .master("local-cluster[2,1,1536]")
      .appName("graft-fault")
      .config("spark.executor.memory", "1g")
      // executors are separate JVMs: they need the sbt class dirs
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-fault-ckpt")
    spark.sparkContext.setCheckpointDir(ckpt.toString)
    import spark.implicits._

    // a 60k-node chain forced through several star-contraction rounds;
    // big enough that the job spans the kill window
    val n = 60000L
    val vertices = spark.range(n).toDF("id")
    val edges = spark.range(n - 1)
      .select(col("id").as("u"), (col("id") + 1).as("v"))

    // wait until both executors registered
    var tries = 0
    while (executorPids().size < 2 && tries < 60) { Thread.sleep(500); tries += 1 }
    val before = executorPids()
    println(s"[fault-bench] executors up: ${before.mkString(", ")}")

    @volatile var killed = Option.empty[Long]
    val killer = new Thread(() => {
      Thread.sleep(4000) // mid-iteration for this size
      executorPids().headOption.foreach { pid =>
        Runtime.getRuntime.exec(Array("kill", "-9", pid.toString)).waitFor()
        killed = Some(pid)
        println(s"[fault-bench] SIGKILLed executor $pid mid-run")
      }
    })
    killer.setDaemon(true)
    killer.start()

    val t0 = System.nanoTime()
    val comp = graft.operators.ConnectedComponents.components(vertices, edges)
      .collect()
    val wall = (System.nanoTime() - t0) / 1e9
    killer.join(1000)
    val ok = comp.length == n && comp.forall(_.getLong(1) == 0L)
    val after = executorPids()
    println(f"[fault-bench] components over $n%d-node chain: " +
      f"correct=$ok wall=$wall%.1f s " +
      s"killed=${killed.getOrElse("NONE (job finished before the kill)")} " +
      s"executors_after=${after.mkString(", ")}")
    require(ok, "connected components wrong after executor loss")

    // ── phase 2 (r8 verdict task #6): STREAMING state-store recovery
    // under executor loss — the one fault path the batch probe above
    // does not exercise. A stateful dedup stream (DocStream.curate's
    // dropDuplicates state) processes batch A, loses an executor by
    // SIGKILL, then must dedup batch B against batch A's state: the
    // state store's version survives in the checkpoint location, so a
    // relaunched executor reloads it instead of re-admitting A's
    // documents. ──
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val sq = graft.streaming.DocStream
      .curate(input.toDS().toDF("doc_id", "text"),
        chunkTokens = 32, stride = 24)
      .writeStream
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        b.select("doc_id", "chunk_id").collect()
          .foreach(r => seen.add((r.getLong(0), r.getLong(1))))
        ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-fault-stream").toString)
      .start()
    // batch A: 2000 quality docs — 30 tokens, mean token length 4.83,
    // 10 % stopwords, so every doc passes the q65 rule filter and the
    // stream's state is exactly one hash per doc
    def tok(v: Long) = "x" + ("000" + java.lang.Long.toString(v, 36)).takeRight(4)
    def doc(i: Long) = (i, (Seq("the", "data", "row") ++
      (0 until 27).map(j => tok(i * 28 + j))).mkString(" "))
    val a = (0L until 2000L).map(doc)
    input.addData(a: _*)
    sq.processAllAvailable()
    val afterA = seen.size
    val pid2 = executorPids().headOption
    pid2.foreach { p =>
      Runtime.getRuntime.exec(Array("kill", "-9", p.toString)).waitFor()
      println(s"[fault-bench] SIGKILLed executor $p between micro-batches")
    }
    // batch B: half EXACT DUPLICATES of batch A (must be dropped by the
    // recovered state), half fresh
    val b = (0L until 1000L).map(doc) ++ (5000L until 6000L).map(doc)
    input.addData(b: _*)
    sq.processAllAvailable()
    sq.stop()
    // a duplicate leak re-emits batch A's chunks in batch B — doubled
    // (doc_id, chunk_id) pairs; fresh docs must all land exactly once
    var dupLeak = 0
    var freshIds = Set.empty[Long]
    val pairs = new java.util.HashSet[(Long, Long)]()
    seen.forEach { p =>
      if (!pairs.add(p)) dupLeak += 1
      if (p._1 >= 5000L) freshIds += p._1
    }
    val okStream = dupLeak == 0 && freshIds.size == 1000
    println(s"[fault-bench] streaming dedup across executor loss: " +
      s"correct=$okStream batchA_chunks=$afterA dup_leaks=$dupLeak " +
      s"fresh_docs=${freshIds.size} " +
      s"executors_after=${executorPids().mkString(", ")}")
    require(okStream, "streaming state lost across executor kill")

    // ── phase 3: REAL mid-batch death of the index-maintenance
    // process. The store specs pin the crash interleavings on
    // reconstructed disk states; this kills an actual child JVM with
    // SIGKILL while batch 1's three delta writes are in flight, then
    // runs the restart sequence (compaction FIRST — the dangerous
    // order — then the replay foreachBatch would deliver) and demands
    // the store equal a never-crashed reference. Every kill landing
    // point must converge: before arrays (uncommitted → replay folds),
    // mid-job-commit (partial, no _SUCCESS → not commit evidence), or
    // after (committed → replay self-rejects on content). ──
    val ixDir = java.nio.file.Files.createTempDirectory("graft-fault-ix")
    val ixPath = ixDir.resolve("ix").toString
    val refPath = ixDir.resolve("ref").toString
    val baseDocs = childDocs(spark, 0L, 2000L)
    graft.streaming.DocStream.initPrefixIndexStore(baseDocs, ixPath, 0.5)
    graft.streaming.DocStream.initPrefixIndexStore(baseDocs, refPath, 0.5)
    // kill as soon as batch 1's FIRST delta commits — the remaining
    // freqd/arrays writes are then in flight or unstarted
    val landedLate = killChildMidBatch("prefix-sink-child", ixPath,
      "entries/batch_id=1/_SUCCESS")
    val arraysCommitted = java.nio.file.Files.exists(
      java.nio.file.Paths.get(ixPath, "arrays/batch_id=1/_SUCCESS"))
    println(s"[fault-bench] child SIGKILLed mid-batch-1 " +
      s"(arrays committed=$arraysCommitted, finished=$landedLate)")
    // the restart sequence a deployment runs: quiet-boundary compaction
    // first, then the stream's redelivery of the uncommitted batch
    graft.streaming.DocStream.compactPrefixIndexStore(spark, ixPath, 0.5)
    val sinkIx = graft.streaming.DocStream.prefixIndexSink(ixPath, 0.5)
    sinkIx(childDocs(spark, 200000L, 204000L), 1L)
    // the never-crashed reference over the same batches
    val sinkRef = graft.streaming.DocStream.prefixIndexSink(refPath, 0.5)
    sinkRef(childDocs(spark, 100000L, 102000L), 0L)
    sinkRef(childDocs(spark, 200000L, 204000L), 1L)
    def storeIds(p: String) = graft.streaming.DocStream
      .loadStreamedPrefixIndex(spark, p)
      .arrays.select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    val gotIds = storeIds(ixPath)
    val wantIds = storeIds(refPath)
    val okKill = gotIds == wantIds
    println(s"[fault-bench] killed-store == reference after " +
      s"compact+replay: correct=$okKill " +
      s"(docs=${gotIds.size} vs ${wantIds.size})")
    require(okKill, "prefix store diverged after a real mid-batch kill")

    // ── phase 4 (r9 verdict task #2): the same real mid-batch SIGKILL
    // for the BM25 store. The kill triggers on batch 1's FIRST delta
    // (tf — the sink commits tf, tot, dfd in that order), so the
    // additive counters are the exposed surface: a compaction that
    // folded the partial batch, or a replay that double-counted it,
    // would corrupt df/totals forever. Restart sequence = compaction
    // first (the dangerous order), then the replay. The reference is a
    // never-crashed store over the same batches; equality is on the
    // LOADED relations (the load path folds snapshots + deltas, so the
    // representations may differ, the contents must not). ──
    {
      import graft.streaming.DocStream
      val dir = java.nio.file.Files.createTempDirectory("graft-fault-bm25")
      val ix = dir.resolve("ix").toString
      val ref = dir.resolve("ref").toString
      // the BM25 sink needs no init: seed batch 0 paths exist after the
      // child's first batch
      val late = killChildMidBatch("bm25-sink-child", ix,
        "tf/batch_id=1/_SUCCESS")
      val dfdCommitted = java.nio.file.Files.exists(
        java.nio.file.Paths.get(ix, "dfd/batch_id=1/_SUCCESS"))
      println(s"[fault-bench] bm25 child SIGKILLed mid-batch-1 " +
        s"(dfd committed=$dfdCommitted, finished=$late)")
      DocStream.compactBm25Index(spark, ix)
      DocStream.bm25IndexSink(ix)(childDocs(spark, 200000L, 204000L), 1L)
      val sinkRef = DocStream.bm25IndexSink(ref)
      sinkRef(childDocs(spark, 100000L, 102000L), 0L)
      sinkRef(childDocs(spark, 200000L, 204000L), 1L)
      def rel(df: org.apache.spark.sql.DataFrame): Seq[String] =
        df.collect().map(_.toSeq.map(String.valueOf).mkString("|"))
          .sorted.toSeq
      val (gi, gr) = (DocStream.loadBm25Index(spark, ix),
        DocStream.loadBm25Index(spark, ref))
      val ok = rel(gi.tf) == rel(gr.tf) && rel(gi.df) == rel(gr.df) &&
        rel(gi.totals) == rel(gr.totals)
      println(s"[fault-bench] killed BM25 store == reference after " +
        s"compact+replay: correct=$ok " +
        s"(postings=${gi.tf.count()} vs ${gr.tf.count()})")
      require(ok, "BM25 store diverged after a real mid-batch kill")
    }

    // ── phase 5 (r9 verdict task #2): the real mid-batch SIGKILL for
    // the ANN store. The kill triggers on batch 1's vecd commit (sigd
    // — the commit point — is then in flight), exposing the
    // batch-level-evidence guard: folding the orphaned vecd would
    // duplicate every batch-1 vector once the replay lands. The killed
    // store must hold each vector exactly once and probe EQUAL to an
    // offline rebuild at its own planes (the AnnStreamSpec hinge — the
    // reference store's planes legitimately differ when the kill
    // interleaving changes which batches the compaction folded). ──
    {
      import graft.streaming.AnnStream
      val dir = java.nio.file.Files.createTempDirectory("graft-fault-ann")
      val ix = dir.resolve("ix").toString
      val baseVecs = childVecs(spark, 0L, 2000L)
      AnnStream.initAnnIndexStore(baseVecs, ix, targetOccupancy = 64)
      val late = killChildMidBatch("ann-sink-child", ix,
        "vecd/batch_id=1/_SUCCESS")
      val sigdCommitted = java.nio.file.Files.exists(
        java.nio.file.Paths.get(ix, "sigd/batch_id=1/_SUCCESS"))
      println(s"[fault-bench] ann child SIGKILLed mid-batch-1 " +
        s"(sigd committed=$sigdCommitted, finished=$late)")
      AnnStream.compactAnnIndexStore(spark, ix, targetOccupancy = 64)
      AnnStream.annIndexSink(ix)(childVecs(spark, 200000L, 204000L), 1L)
      val got = AnnStream.loadStreamedAnnIndex(spark, ix)
      val ids = got.vecs.select("vec_id").collect().map(_.getLong(0)).toSeq
      val wantIdSet = ((0L until 2000L) ++ (100000L until 102000L) ++
        (200000L until 204000L)).toSeq
      val idsOk = ids.sorted == wantIdSet
      // probe parity vs an offline rebuild over the same vectors at the
      // killed store's own frozen planes
      val allVecs = baseVecs
        .unionByName(childVecs(spark, 100000L, 102000L))
        .unionByName(childVecs(spark, 200000L, 204000L))
      val queries = childVecs(spark, 1000000000L, 1000000064L)
      def probeRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
        df.collect().map(_.toSeq.map(String.valueOf).mkString("|"))
          .sorted.toSeq
      val gotProbe = probeRows(AnnStream.knnProbe(got, queries, k = 3,
        probeFlips = 1))
      val offline = probeRows(graft.operators.AnnQueries.knnProbeLsh(
        graft.operators.AnnQueries.signSignatures(allVecs, got.planes),
        allVecs, got.planes, queries, k = 3, probeFlips = 1))
      val ok = idsOk && gotProbe == offline
      println(s"[fault-bench] killed ANN store == offline rebuild after " +
        s"compact+replay: correct=$ok (vecs=${ids.size}, " +
        s"planes=${got.planes}, probe_rows=${gotProbe.size})")
      require(ok, "ANN store diverged after a real mid-batch kill")
    }
    spark.stop()
  }
}
