package graft.operators

import graft.SparkSpec

/** [[AnnQueries.hybridRrf]] (q127): planted fusion semantics — a doc
  * ranked well by BOTH arms must beat a doc that tops only one
  * (2/(60+2) > 1/(60+1)), and a query with no embedding degrades to
  * its lexical ranking rather than erroring or vanishing. */
class HybridRrfSpec extends SparkSpec {

  private val filler = "f1 f2 f3"

  private def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def embDf(rows: Seq[(Long, Array[Float])]) = {
    import spark.implicits._
    rows.map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label")
  }

  test("both-arm agreement beats a single-arm top rank") {
    val docs = docsDf(Seq(
      (0L, s"zz1 zz2 $filler"),          // query
      (10L, s"zz1 zz1 zz2 zz2 $filler"), // lexical top, semantic nobody
      (11L, s"$filler $filler"),         // semantic top, lexical tail
      (12L, s"zz1 $filler")              // rank ~2 in BOTH arms
    ))
    val emb = embDf(Seq(
      (0L, Array(1f, 0f)),               // query vector
      (10L, Array(0f, 1f)),              // orthogonal — semantic bottom
      (11L, Array(1f, 0.01f)),           // semantic rank 1
      (12L, Array(1f, 0.1f))             // semantic rank 2
    ))
    // depth 2 so each arm's list actually TRUNCATES on this 3-candidate
    // corpus (at depth 20 every doc is in both lists and the test would
    // measure rank arithmetic, not absence)
    val out = AnnQueries.hybridRrf(docs, emb, depth = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val q0 = out.filter(_._1 == 0L)
    assert(q0.map(_._3).contains(10L) && q0.map(_._3).contains(11L)
      && q0.map(_._3).contains(12L))
    assert(q0.head._3 == 12L,
      "second-in-both must outrank first-in-one (2/62 > 1/61)")
    assert(!q0.exists(_._3 == 0L), "query doc excluded from both arms")
    assert(q0.map(_._4).toSeq == q0.map(_._4).toSeq.sortBy(-_))
  }

  test("a query with no embedding degrades to its lexical ranking") {
    // doc 29 is a query (29 % 29 == 0) present in documents only
    val docs = docsDf(Seq(
      (29L, s"yy1 yy2 $filler"),
      (30L, s"yy1 yy1 yy2 $filler"),
      (31L, s"yy1 $filler"),
      (32L, s"$filler f1")
    ))
    val emb = embDf(Seq(            // no vec 29: semantic arm empty for it
      (30L, Array(1f, 0f)),
      (31L, Array(0f, 1f)),
      (32L, Array(1f, 1f))
    ))
    val fused = AnnQueries.hybridRrf(docs, emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(_._1 == 29L)
    val lex = CurationQueries.bm25TopK(docsDf(Seq(
      (29L, s"yy1 yy2 $filler"),
      (30L, s"yy1 yy1 yy2 $filler"),
      (31L, s"yy1 $filler"),
      (32L, s"$filler f1"))), k = 20).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(_._1 == 29L)
    assert(fused.nonEmpty, "lexical-only queries must still be answered")
    assert(fused.map(_._3).toSeq == lex.map(_._3).toSeq.take(5),
      "fusion over one arm preserves that arm's ranking")
  }
}
