package graft.operators

import graft.SparkSpec

/** Planted-duplicate verification for the hash-based near-dup detectors
  * (q30 MinHash-LSH, q31 SimHash) that have no DuckDB oracle. */
class DedupSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    val rand0 = new scala.util.Random(11)
    val baseWords = (0 until 200).map(_ => s"tok${rand0.nextInt(300)}")
    val base = baseWords.mkString(" ")
    val nearDup = baseWords.updated(17, "changed").mkString(" ") // one token differs
    val nearDup2 = (baseWords ++ Seq("extra", "tail")).mkString(" ")
    val other = "completely different content about trains schedules delays and probability curves for transit prediction systems everywhere"
    val rand = new scala.util.Random(7)
    val noise = (0 until 50).map { i =>
      val words = (0 until 30).map(_ => s"w${rand.nextInt(500)}")
      (100L + i, words.mkString(" "))
    }
    (Seq((1L, base), (2L, nearDup), (3L, nearDup2), (4L, other)) ++ noise)
      .toDF("doc_id", "text")
  }

  test("minhash-LSH surfaces planted near-duplicates, not unrelated docs") {
    val cand = DedupQueries.minhashCandidates(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((1L, 2L)) || cand.contains((1L, 3L)),
      s"expected a planted pair among candidates, got $cand")
    // the unrelated doc 4 must not pair with 1..3
    assert(!cand.exists { case (a, b) => (a <= 3L) && b == 4L })
  }

  test("simhash surfaces planted near-duplicates with small hamming distance") {
    val cand = DedupQueries.simhashCandidates(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val planted = cand.filter(c => c._1 <= 3 && c._2 <= 3)
    assert(planted.nonEmpty, s"expected planted pairs, got ${cand.toSeq}")
    assert(planted.forall(_._3 <= 16))
    assert(!cand.exists(c => c._1 <= 3 && c._2 == 4L))
  }
}
