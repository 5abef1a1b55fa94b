package graft.streaming

import graft.SparkSpec
import graft.operators.CurationQueries
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** [[DocStream.bm25IndexSink]] / [[DocStream.loadBm25Index]]: the
  * streamed retrieval index must be EQUAL to an offline build over the
  * same documents — relations and scoring both — and a replayed batch
  * (foreachBatch's at-least-once contract) must leave the index
  * unchanged. */
class Bm25StreamSpec extends SparkSpec {

  private def relRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  test("streamed index == offline build; batch replay is idempotent") {
    import spark.implicits._
    val vocab = (0 until 10).map(i => s"w$i")
    val rnd = new scala.util.Random(3)
    def doc(i: Long) =
      (i, Seq.fill(5 + rnd.nextInt(5))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    val batches = Seq((0L until 20L).map(doc), (20L until 45L).map(doc),
      (45L until 60L).map(doc))

    val dir = java.nio.file.Files.createTempDirectory("graft-bm25-stream")
    val path = dir.resolve("ix").toString
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = input.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch(DocStream.bm25IndexSink(path))
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    val streamed = DocStream.loadBm25Index(spark, path)
    val offline = CurationQueries.buildBm25Index(
      batches.flatten.toDF("doc_id", "text"))
    assert(relRows(streamed.tf) == relRows(offline.tf), "tf postings equal")
    assert(relRows(streamed.df) == relRows(offline.df), "folded df equal")
    assert(relRows(streamed.totals) == relRows(offline.totals), "totals equal")

    // scoring through the streamed index matches the offline index
    val queries = Seq((1000L, "w1 w2 w3 zz"), (1001L, "w7 w8")).toDF("doc_id", "text")
    def score(ix: CurationQueries.Bm25Index) = CurationQueries
      .bm25ScoreIndexed(ix, CurationQueries.bm25QueryTerms(ix, queries))
      .collect().map(_.toSeq).toSeq
    val s = score(streamed)
    assert(s.nonEmpty && s == score(offline))

    // at-least-once replay: re-running batch 1's write with the same
    // batch_id overwrites its own partition — nothing double-counts
    DocStream.bm25IndexSink(path)(batches(1).toDF("doc_id", "text"), 1L)
    val replayed = DocStream.loadBm25Index(spark, path)
    assert(relRows(replayed.df) == relRows(offline.df), "replayed df equal")
    assert(relRows(replayed.totals) == relRows(offline.totals))
    assert(score(replayed) == s, "replay leaves scoring unchanged")
  }
}
