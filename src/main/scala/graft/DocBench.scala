package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throughput probe for the near-dup/text battery at beyond-testdata scale
  * (the sf0.1 documents table is 5k rows; this synthesizes 100k+ with
  * planted duplicate clusters and measures the candidate generators end to
  * end, including the salted heavy-bucket path).
  *
  * Run: SPARK_GRAFT_DOCS=100000 sbt 'runMain graft.DocBench'
  */
object DocBench {
  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_DOCS", "100000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic corpus, generated in-engine: 60-token docs over a 20k
    // vocabulary; every 20th doc is a near-duplicate of its cluster head
    // (1 token changed), and 2% of docs share ONE identical heavy text to
    // exercise the salted LSH path
    val docs = spark.range(nDocs)
      .withColumn("cluster", (col("id") / 20).cast("long"))
      .withColumn("is_dup", col("id") % 20 < 2)
      .withColumn("heavy", col("id") % 50 === 49)
      .withColumn("text",
        when(col("heavy"), lit((0 until 60).map(i => s"h$i").mkString(" ")))
          .otherwise(concat_ws(" ",
            transform(sequence(lit(0), lit(59)),
              i => concat(lit("w"), pmod(
                xxhash64(when(col("is_dup") && i === 7, col("cluster") + 1000000)
                  .otherwise(col("cluster") * 100 + i)), lit(20000)))))))
      .select(col("id").as("doc_id"), col("text"))
      .cache()
    println(s"[doc-bench] corpus: ${docs.count()} docs")

    def time[T](name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[doc-bench] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s ($n rows)")
    }

    time("minhash LSH candidates (salted heavy buckets)") {
      graft.operators.DedupQueries.minhashCandidates(
        docs, heavyBucketThreshold = 1000, salt = 16).count()
    }
    time("simhash candidates") {
      graft.operators.DedupQueries.simhashCandidates(docs).count()
    }
    time("exact-dup groups") {
      docs.groupBy(xxhash64(col("text"))).agg(count(lit(1)).as("n"))
        .filter(col("n") > 1).count()
    }
    // duplicate-GROUP resolution over the full near-dup candidate relation:
    // large-star/small-star connected components on millions of edges
    // (including the degenerate 2%-identical cluster -> one giant
    // component) + canonical-representative count. The O(log^2) round
    // bound is what matters: the candidate graph's structure (2k-node
    // near-clique + 5k 2-node clusters) must not change round count.
    time("connected components over minhash candidates") {
      val edges = graft.operators.DedupQueries.minhashCandidates(
        docs, heavyBucketThreshold = 1000, salt = 16)
        .select(col("id1").as("u"), col("id2").as("v"))
      val comps = graft.operators.ConnectedComponents.components(
        docs.select(col("doc_id").as("id")), edges)
      comps.filter(col("id") =!= col("component")).count()
    }
    // adversarial CC shape: ONE chain of nDocs*10 nodes (diameter = n-1).
    // Min-label propagation would need a round per hop — ~1M rounds here;
    // large-star/small-star must collapse it in O(log^2 n). This is the
    // structure a pathological near-dup corpus produces (each doc similar
    // only to its neighbor, e.g. sliding-window crawl snapshots).
    time(s"connected components over a ${nDocs * 10}-node chain") {
      val n = nDocs * 10
      val chain = spark.range(n - 1)
        .select(col("id").as("u"), (col("id") + 1).as("v"))
      val comps = graft.operators.ConnectedComponents.components(
        spark.range(n).toDF("id"), chain)
      comps.filter(col("component") =!= 0L).count() // all must reach node 0
    }
    // 4 source blocks of nDocs/4: all-pairs would be ~4 * C(n/4, 2) pairs
    // (1.25G at 100k docs) - the prefix-filtered exact join must stay
    // tractable, including the degenerate 2% identical-text cluster.
    // shingleLen=8: this synthetic corpus is digit-heavy, so 3-char
    // shingles have a tiny universe (every shingle hot -> prefix filter
    // can't help, see the operator's precondition note); 8-char shingles
    // restore the rare tail the filter needs
    time("char-shingle prefix similarity join (exact, t=0.5, len=8)") {
      graft.operators.DedupQueries.charShinglePrefixJoin(
        docs.withColumn("source", concat(lit("s"), pmod(col("doc_id"), lit(4)))),
        shingleLen = 8)
        .count()
    }
    // streaming fuzzy-decon screen at ingest-path scale: the whole
    // corpus arrives against a broadcast 500-doc eval suite (the first
    // 500 corpus texts re-numbered as eval docs, so they and their
    // near-dup cluster mates must flag). The screen is stateless and
    // shuffle-free, so this static-frame run IS the per-batch cost
    // shape a foreachBatch trigger pays.
    time("fuzzy-decon screen: corpus vs broadcast 500-doc eval suite") {
      val eval = docs.filter(col("doc_id") < 500)
        .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
      graft.streaming.DocStream.deconScreenStream(docs, eval).count()
    }
    // ONE GIANT SOURCE: the stratum shape of a real training mix (one
    // source holds ~99% of the corpus). The r5 window formulations
    // serialize the giant stratum through a single task; the r6
    // hash-threshold / two-phase-prefix-sum shapes must parallelize it.
    // 10x the base corpus: at 1M docs the old shape's single task sorts
    // 1M rows alone while these stay partition-parallel.
    val giant = spark.range(nDocs * 10)
      .select(col("id").as("doc_id"),
        when(pmod(col("id"), lit(100)) === 0,
          concat(lit("small"), pmod(col("id"), lit(3))))
          .otherwise(lit("giant")).as("source"),
        concat_ws(" ", transform(sequence(lit(0), lit(19)),
          i => concat(lit("w"), pmod(xxhash64(col("id") * 20 + i), lit(5000)))))
          .as("text"))
      .cache()
    println(s"[doc-bench] giant-source corpus: ${giant.count()} docs")
    time(s"stratified sample (hash-threshold) over ${nDocs * 10} docs, one giant source") {
      graft.operators.PipelineQueries.stratifiedSample(giant, 0.25).count()
    }
    time(s"token-budget mix (two-phase prefix sum), budget covers ~half the giant source") {
      graft.operators.PipelineQueries.tokenBudgetMix(giant, nDocs * 10L).count()
    }
    giant.unpersist()
    spark.stop()
  }
}
