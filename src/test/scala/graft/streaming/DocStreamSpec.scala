package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class DocStreamSpec extends SparkSpec {

  // passes the q65 rules: 40 tokens of mean length ~4.5, stopword-rich
  private def goodDoc(seed: Int): String =
    (0 until 40).map(i => if (i % 8 == 0) "data" else s"tok${(seed * 40 + i) % 97}")
      .mkString(" ")

  test("streaming curation: rule filter + cross-batch dedup + chunking") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val out = DocStream.curate(input.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("curated")
      .outputMode("append").start()
    def rows() = spark.table("curated")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted

    // batch 1: two good docs (one duplicated within the batch) + a reject
    input.addData((0L, goodDoc(0)), (1L, goodDoc(0)), (2L, goodDoc(1)),
      (3L, "too short to pass"))
    out.processAllAvailable()
    // 40 tokens, stride 24 -> chunk starts 1 and 25 -> 2 chunks per doc;
    // doc 1 is an exact dup of doc 0 (one survives), doc 3 fails the rules
    val first = rows()
    assert(first.length === 4, s"got ${first.toSeq}")
    assert(first.map(_._1).distinct.length === 2)
    assert(first.map(_._2).toSet === Set(0L, 1L))

    // batch 2: the SAME text again under a new id -> cross-batch dedup
    input.addData((4L, goodDoc(0)), (5L, goodDoc(7)))
    out.processAllAvailable()
    val second = rows()
    assert(second.length === 6, s"got ${second.toSeq}")
    assert(!second.map(_._1).contains(4L), "cross-batch duplicate dropped")
    assert(second.map(_._1).count(_ == 5L) === 2)
    out.stop()
  }

  // the bounded-dedup contract must hold under BOTH state store
  // providers: the default on-heap HDFS-backed store and the RocksDB
  // store a horizon-scale deployment needs (state on local disk)
  for ((label, provider) <- Seq(
      "default" -> None,
      "rocksdb" -> Some(DocStream.RocksDbStateStoreProvider)))
  test(s"bounded curation under the $label state store: in-horizon dups drop, expired hashes re-admit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(secs: Long) = new java.sql.Timestamp(secs * 1000L)
    val saved = spark.conf.getOption(DocStream.StateStoreProviderKey)
    provider.foreach(spark.conf.set(DocStream.StateStoreProviderKey, _))
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val out = DocStream.curateBounded(
        input.toDS().toDF("doc_id", "text", "ts"), watermarkDelay = "10 seconds")
      .writeStream.format("memory").queryName(s"curated_bounded_$label")
      .outputMode("append").start()
    try {
      def ids() = spark.table(s"curated_bounded_$label")
        .collect().map(_.getLong(0)).distinct.sorted.toSeq

      // batch 1: the original document
      input.addData((0L, goodDoc(0), ts(100)))
      out.processAllAvailable()
      assert(ids() === Seq(0L))
      // batch 2: a dup INSIDE the horizon (watermark at 100 - 10 = 90 s)
      // drops; the unrelated doc advances the watermark to 500 - 10 = 490 s
      input.addData((1L, goodDoc(0), ts(105)), (2L, goodDoc(1), ts(500)))
      out.processAllAvailable()
      assert(ids() === Seq(0L, 2L), "in-horizon duplicate dropped")
      // batch 3: doc 0's hash (event time 100 s + 10 s horizon < watermark
      // 490 s) has EXPIRED -> the same text is admitted again
      input.addData((3L, goodDoc(0), ts(501)))
      out.processAllAvailable()
      assert(ids() === Seq(0L, 2L, 3L), "expired hash re-admitted")
    } finally {
      out.stop()
      saved match {
        case Some(v) => spark.conf.set(DocStream.StateStoreProviderKey, v)
        case None => spark.conf.unset(DocStream.StateStoreProviderKey)
      }
    }
  }

  test("streaming KMV distinct sketch: exact below k, accumulates across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val batches = scala.collection.mutable.ArrayBuffer.empty[Map[String, (Int, Long)]]
    val out = DocStream.distinctSketchStream(
        input.toDS().toDF("source", "h"), k = 16)
      .writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches += df.collect()
          .map(r => r.getString(0) -> ((r.getInt(1), r.getLong(2)))).toMap
        ()
      }
      .start()

    // batch 1: 10 distinct hashes (below k=16) with repeats
    input.addData((1L to 10L).flatMap(h => Seq(("s0", h), ("s0", h))): _*)
    out.processAllAvailable()
    assert(batches.last("s0") == ((10, 10L)),
      "below k the sketch is exact over distinct hashes")

    // batch 2: 10 more distinct hashes -> crosses k; state accumulated
    // across batches means the k smallest of ALL 20 survive (1..16)
    input.addData((11L to 20L).map(h => ("s0", h)): _*)
    out.processAllAvailable()
    assert(batches.last("s0") == ((16, 16L)),
      "k smallest of the cross-batch union must survive")
    out.stop()
  }

  test("streaming heavy hitters: cross-batch MG state, bounded, superset-safe") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val k = 8
    val input = MemoryStream[(String, String)]
    // capture each micro-batch's emitted summary separately (the memory
    // sink would interleave batches, hiding evictions)
    val batches = scala.collection.mutable.ArrayBuffer.empty[Map[(String, String), Long]]
    val out = DocStream.heavyHitterStream(
        input.toDS().toDF("source", "token"), k = k)
      .writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches += df.collect()
          .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
        ()
      }
      .start()

    // batch 1: 'hot' dominates src0 amid tail noise
    input.addData(
      (Seq.fill(30)("hot") ++ (0 until 20).map(i => s"t$i")).map(("src0", _)): _*)
    out.processAllAvailable()
    val b1 = batches.last
    assert(b1.contains(("src0", "hot")), "dominant key must survive batch 1")
    assert(b1.keys.count(_._1 == "src0") <= 2 * k, "state bounded by 2k")
    // lower-bound contract: reported <= true count
    assert(b1(("src0", "hot")) <= 30L)

    // batch 2: 'hot' keeps flowing, a second source appears — state
    // carries ACROSS batches (hot's counter grows past batch 1's alone:
    // +25 occurrences against at most 16 tail-key decrements)
    input.addData(
      (Seq.fill(25)(("src0", "hot")) ++
        (20 until 36).map(i => ("src0", s"t$i")) ++
        Seq.fill(5)(("src1", "only"))): _*)
    out.processAllAvailable()
    val b2 = batches.last
    assert(b2(("src0", "hot")) > b1(("src0", "hot")),
      "summary must accumulate across micro-batches")
    assert(b2(("src0", "hot")) <= 55L)
    assert(b2(("src1", "only")) == 5L)
    assert(b2.keys.count(_._1 == "src0") <= 2 * k)
    out.stop()
  }

  test("nearDupStream: cross-batch near-dups collide; unrelated docs do not") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = DocStream.nearDupStream(input.toDS().toDF("doc_id", "text"))
      .writeStream.outputMode("update")
      .format("memory").queryName("near_dups").start()
    try {
      val base = "the quick brown fox jumps over the lazy dog again and " +
        "again while the spark engine counts every token stream it sees"
      // SAME-LENGTH substitution: the stride-4 gram sampling is
      // position-anchored, so a length-changing edit shifts every
      // downstream gram (that's q69's alignment lesson); a same-length
      // edit only perturbs grams overlapping the edit window
      val edited = base.replace("lazy", "hazy") // near-dup, not exact
      val other = "completely different content about delay curves and " +
        "gtfs schedules with no overlap whatsoever in its character grams"
      input.addData((1L, base), (2L, other)); q.processAllAvailable()
      input.addData((3L, edited)); q.processAllAvailable()
      val got = spark.table("near_dups")
        .as[DocStream.NearDupMatch].collect().toSeq
      // the edited re-submission must match its batch-1 original...
      val m = got.filter(r => r.doc_id == 3L && r.matched_id == 1L)
      assert(m.nonEmpty, s"expected 3~1 collision, got $got")
      // ...with a high signature agreement (band collision guarantees >= 4)
      assert(m.map(_.n_equal_sigs).max >= 4)
      // the unrelated document never matches anything
      assert(!got.exists(r => r.doc_id == 2L || r.matched_id == 2L))
      // an EXACT duplicate agrees on all 16 components
      input.addData((4L, base)); q.processAllAvailable()
      val exact = spark.table("near_dups").as[DocStream.NearDupMatch]
        .collect().filter(r => r.doc_id == 4L && r.matched_id == 1L)
      assert(exact.nonEmpty && exact.forall(_.n_equal_sigs == 16))
    } finally q.stop()
  }

  test("nearDupStream: bucket state is FIFO-bounded by maxPerBucket") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    // identical text -> every doc lands in the same 4 buckets
    val q = DocStream.nearDupStream(input.toDS().toDF("doc_id", "text"),
      maxPerBucket = 3)
      .writeStream.outputMode("update")
      .format("memory").queryName("near_dups_cap").start()
    try {
      val t = "twelve identical tokens streaming through the same bucket " +
        "every single time without any variation at all here"
      input.addData((0L until 5L).map(i => (i, t)): _*); q.processAllAvailable()
      // state rows = 4 bands x 1 bucket; each holds <= 3 docs
      val stateRows = q.recentProgress
        .flatMap(_.stateOperators.map(_.numRowsTotal)).max
      assert(stateRows == 4L)
      input.addData((5L, t)); q.processAllAvailable()
      val got = spark.table("near_dups_cap")
        .as[DocStream.NearDupMatch].collect()
      // doc 5 matches exactly the 3 bucket survivors (within-batch
      // arrival order across shuffle partitions picks WHICH 3)
      val m5 = got.filter(_.doc_id == 5L).map(_.matched_id).distinct.sorted
      assert(m5.length == 3 && m5.forall(i => i >= 0L && i <= 4L), s"got $m5")
    } finally q.stop()
  }

  test("deconScreenStream: streamed matches over any batch split equal the offline q133 relation") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.documents(spark, d)
    val evalDocs = docs.filter(col("source") === "src0")
      .select("doc_id", "text")
    // the offline yardstick: q133's verified match relation on the
    // full corpus (per-doc verdicts are batch-independent, so the
    // streamed screen must reproduce it EXACTLY, not approximately)
    val offline = graft.operators.PipelineQueries
      .fuzzyDeconMatches(docs, 0.8,
        graft.operators.PipelineQueries.LshBands,
        graft.operators.PipelineQueries.LshRows)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(offline.nonEmpty)
    val train = docs.filter(col("source") =!= "src0")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String)]
    val q = DocStream.deconScreenStream(
        input.toDS().toDF("doc_id", "text"), evalDocs)
      .writeStream.format("memory").queryName("deconscreen")
      .outputMode("append").start()
    try {
      // three arbitrary batch splits of the train corpus
      (0 until 3).foreach { b =>
        input.addData(train.filter(_._1 % 3 == b): _*)
        q.processAllAvailable()
      }
      val got = spark.table("deconscreen").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      // per-band emission dedupes to the offline distinct pair set,
      // with the identical verified jaccard on every emission
      assert(got.toMap === offline)
      got.groupBy(_._1).foreach { case (pair, vs) =>
        assert(vs.map(_._2).distinct.length === 1, s"jac varies for $pair")
      }
    } finally q.stop()
  }
}
