package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The triangle-blocked self-join cover must emit exactly the plain
  * group-keyed self-join's unordered pairs — no duplicates, no drops —
  * for any block count, including blocks > group size and single-row
  * groups. */
class BlockingSpec extends SparkSpec {

  test("blocked cover == plain all-pairs on random groups, several block counts") {
    import spark.implicits._
    val rnd = new scala.util.Random(37)
    val rows = (0L until 300L).map(i => (i, s"g${rnd.nextInt(4)}"))
      .toDF("id", "g")
    val plain = {
      val a = rows.select(col("g"), col("id").as("x"))
      val b = rows.select(col("g"), col("id").as("y"))
      a.join(b, Seq("g")).filter(col("x") < col("y"))
        .select(col("x"), col("y"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    for (blocks <- Seq(1, 2, 8, 64)) {
      val (lft, rgt) = Blocking.triangleSides(rows, col("id"), blocks)
      val a = lft.select(col("g"), col("__bi"), col("__bj"), col("id").as("x"))
      val b = rgt.select(col("g"), col("__bi"), col("__bj"), col("id").as("y"))
      val got = a.join(b, Seq("g", "__bi", "__bj"))
        .filter(Blocking.pairPredicate(col("x"), col("y")))
        .select(least(col("x"), col("y")), greatest(col("x"), col("y")))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length === got.toSet.size, s"blocks=$blocks: duplicates emitted")
      assert(got.toSet === plain, s"blocks=$blocks")
    }
  }

  test("blocks is a cost-only knob: blocks=1 == default on the factored joins") {
    val d = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.documents(spark, d)
    def jkey(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e9))).toSet
    assert(jkey(DedupQueries.tokenJaccardBlocked(docs, blocks = 1)) ===
      jkey(DedupQueries.tokenJaccardBlocked(docs)))
    val emb = graft.sources.Tables.embeddings(spark, d)
    def ekey(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(ekey(DedupQueries.embedNearDupPairs(emb, blocks = 1)) ===
      ekey(DedupQueries.embedNearDupPairs(emb)))
  }

  test("blocksFor sizes to the stratum: 1 for small groups, capped for huge") {
    assert(Blocking.blocksFor(0) == 1)
    assert(Blocking.blocksFor(2048) == 1)
    assert(Blocking.blocksFor(2049) == 2)
    assert(Blocking.blocksFor(1000000, maxBlocks = 1024) == 489) // ceil(1e6/2048)
    assert(Blocking.blocksFor(1000000) == 64) // default cap
    // monotone in rows
    val bs = Seq(1L, 100L, 10000L, 100000L, 10000000L)
      .map(Blocking.blocksFor(_, targetPerBucket = 2048, maxBlocks = 1 << 20))
    assert(bs == bs.sorted)
  }

  test("q29 blocked output == plain source-keyed join output on real data") {
    val d = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.documents(spark, d)
    val toks = docs.select(col("doc_id"), col("source"),
      array_distinct(split(col("text"), " ")).as("t"))
    val plain = {
      val a = toks.select(col("source"), col("doc_id").as("id1"),
        col("t").as("t1"), size(col("t")).as("n1"))
      val b = toks.select(col("source"), col("doc_id").as("id2"),
        col("t").as("t2"), size(col("t")).as("n2"))
      a.join(b, Seq("source")).filter(col("id1") < col("id2"))
        .withColumn("inter", size(array_intersect(col("t1"), col("t2"))))
        .withColumn("jac", col("inter").cast("double") /
          (col("n1") + col("n2") - col("inter")))
        .filter(col("jac") >= 0.4)
        .select(col("id1"), col("id2"), col("jac"))
        .collect().map(r => (r.getLong(0), r.getLong(1),
          math.round(r.getDouble(2) * 1e9))).toSet
    }
    val blocked = DedupQueries.registry("q29_jaccard_pairs").build(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e9))).toSet
    assert(blocked === plain)
    assert(blocked.nonEmpty)
  }
}
