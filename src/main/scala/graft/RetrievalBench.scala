package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** BM25 stopword-prune probe (r8 verdict task #2): measures what
  * `dfPruneFactor` buys on an OPEN vocabulary — the scored-posting
  * volume (Σ over query terms of posting-list length, the quantity the
  * prune exists to bound) and the scoring wall, with and without the
  * prune, over the same prebuilt index.
  *
  * Corpus: E docs × 60 tokens, cubed-uniform over a 20k vocabulary
  * (IncrementalBench's Zipf-ish profile): head tokens appear in ~90 %
  * of documents — true stopword-class posting lists, the regime the
  * closed 31-token registry vocabulary cannot reach (q126 scaladoc).
  * Also reports ranking impact: how many queries keep an IDENTICAL
  * top-k under the prune and how many degrade to empty (all-stopword
  * queries — the defined partial-signal semantics).
  *
  * Run: SPARK_GRAFT_DOCS=100000 sbt 'runMain graft.RetrievalBench'
  * Dev tooling (PERF.md evidence), not part of the driver contract. */
object RetrievalBench {
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
    import graft.operators.CurationQueries

    val docs = spark.range(nDocs)
      .select(col("id").as("doc_id"), BenchCorpus.zipfText(col("id")).as("text"))
    val index = CurationQueries.buildBm25Index(docs)
    val qdocs = docs.filter(col("doc_id") % 997 === 0)
    println(s"[retrieval-bench] $nDocs docs, ${qdocs.count()} queries")

    // TWO query-term shapes. (a) rarest-4 derivation (the q126 path):
    // the selection itself avoids stopwords, so the prune should be a
    // near-no-op — measured to prove the registered path needs no knob.
    // (b) FULL query text (every distinct token of the query doc, the
    // raw-user-query production shape scored through the
    // bm25ScoreIndexed belt): head tokens drag corpus-scale posting
    // lists into the join — the volume the prune exists to cut.
    def rarestTerms(factor: Long) =
      CurationQueries.bm25QueryTerms(index, qdocs, dfPruneFactor = factor)
    val fullTerms = index.df.join(
      broadcast(qdocs.select(col("doc_id").as("query_id"),
        explode(array_distinct(split(col("text"), " "))).as("token"))),
      Seq("token"))
      .select(col("query_id"), col("df"), col("token"))

    def run(label: String, qterms: org.apache.spark.sql.DataFrame,
            factor: Long): (Long, Map[Long, Seq[(Long, Long)]]) = {
      val pruned = CurationQueries.dfPruned(qterms, factor, index.totals)
      // the prune's target quantity: postings the scoring join touches
      val volume = index.tf
        .join(pruned.select(col("query_id"), col("token")), Seq("token"))
        .count()
      val t0 = System.nanoTime()
      val rows = CurationQueries
        .bm25ScoreIndexed(index, qterms, k = 5, dfPruneFactor = factor)
        .collect()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[retrieval-bench] $label factor=$factor%2d " +
        f"scored_postings=$volume result_rows=${rows.length} " +
        f"score_wall=$wall%.1f s")
      (volume, rows.map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap)
    }
    def report(label: String, v0: Long, m0: Map[Long, Seq[(Long, Long)]],
               v10: Long, m10: Map[Long, Seq[(Long, Long)]]): Unit = {
      val same = m0.keySet.intersect(m10.keySet).count(q => m0(q) == m10(q))
      val emptied = m0.keySet.diff(m10.keySet).size
      println(f"[retrieval-bench] $label posting volume $v0 -> $v10 " +
        f"(${v10.toDouble / v0 * 100}%.1f%%); identical top-k: " +
        s"$same/${m0.size}; degraded to empty: $emptied")
    }
    // (prune applied inside bm25QueryTerms here, so run()'s own factor
    // stays 0 — the label carries the configuration)
    val (a0, ra0) = run("rarest4/unpruned", rarestTerms(0L), 0L)
    val (a10, ra10) = run("rarest4/pruned10", rarestTerms(10L), 0L)
    report("rarest4  ", a0, ra0, a10, ra10)
    val (b0, rb0) = run("full-text", fullTerms, 0L)
    val (b10, rb10) = run("full-text", fullTerms, 10L)
    report("full-text", b0, rb0, b10, rb10)
    spark.stop()
  }
}
