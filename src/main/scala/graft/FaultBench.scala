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
  * Run: sbt 'runMain graft.FaultBench'   (results recorded in PERF.md)
  * Dev tooling — not part of the driver contract. */
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

  def main(args: Array[String]): Unit = {
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
    spark.stop()
  }
}
