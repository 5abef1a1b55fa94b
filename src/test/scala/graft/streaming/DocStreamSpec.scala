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

  test("bounded curation: in-horizon dups drop, expired hashes re-admit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(secs: Long) = new java.sql.Timestamp(secs * 1000L)
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val out = DocStream.curateBounded(
        input.toDS().toDF("doc_id", "text", "ts"), watermarkDelay = "10 seconds")
      .writeStream.format("memory").queryName("curated_bounded")
      .outputMode("append").start()
    def ids() = spark.table("curated_bounded")
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
    out.stop()
  }
}
