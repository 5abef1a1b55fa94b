package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.{Encoders, Row}
import org.apache.spark.sql.functions._

/** Sketch-then-verify curation battery: Misra-Gries candidates must be a
  * proven superset, the verified output must equal brute force exactly,
  * and the deterministic priority sample must match its row_number twin. */
class CurationSpec extends SparkSpec {

  test("MisraGries summary keeps every key above the m/(k+1) bound") {
    import spark.implicits._
    // adversarial mix: two genuinely heavy keys buried in a long tail of
    // singletons (the stream MG is designed for), several partitions so
    // merge() runs with overflow (tail keys exceed k per partial)
    val rows =
      Seq.fill(400)("hot1") ++ Seq.fill(150)("hot2") ++
        (0 until 1000).map(i => s"tail$i")
    val m = rows.length.toLong
    val k = 16
    val mg = udaf(new graft.functions.MisraGries(k), Encoders.STRING)
    val kept = scala.util.Random.shuffle(rows).toDF("t").repartition(7)
      .agg(mg(col("t"))).head().getSeq[String](0).toSet
    val counts = rows.groupBy(identity).view.mapValues(_.size.toLong)
    val mustSurvive = counts.filter(_._2 > m / (k + 1)).keys.toSet
    assert(mustSurvive.nonEmpty && mustSurvive.subsetOf(kept),
      s"missing guaranteed keys: ${mustSurvive -- kept}")
    assert(kept.size <= 2 * k, "summary must stay bounded")
  }

  test("heavyHitters == brute-force exact counts on a skewed corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    // zipf-ish: token w<j> drawn with probability ~ 1/(j+1)
    val toks = (0 until 30000).map { _ =>
      val j = (math.pow(rnd.nextDouble(), 3) * 200).toInt
      (s"s${rnd.nextInt(2)}", s"w$j")
    }.toDF("source", "token")
    val denom = 50L
    val got = CurationQueries.heavyHitters(toks, denom = denom, k = 128)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val want = toks.collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).toSeq.flatMap { case (src, rs) =>
        val m = rs.length.toLong
        rs.groupBy(_._2).collect {
          case (t, occ) if occ.length * denom >= m => (src, t, occ.length.toLong)
        }
      }.sortBy(t => (t._1, t._2))
    assert(got == want)
    assert(want.nonEmpty, "corpus must actually contain heavy hitters")
    intercept[IllegalArgumentException] {
      CurationQueries.heavyHitters(toks, denom = 500L, k = 400)
    }
  }

  test("prioritySample matches its row_number twin on the real table") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val got = CurationQueries.prioritySample(docs, k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val twin = docs.selectExpr("source", "doc_id",
      "least(cast(size(split(text, ' ')) as bigint), 1000000) as w",
      "(doc_id % 1000000007 * 2654435761 + 12345) % 1000000007 + 1 as h")
      .selectExpr("source", "doc_id", "w * 1000000000000 div h as prio")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("source")
          .orderBy(col("prio").desc, col("doc_id"))))
      .filter(col("rn") <= 5).select("source", "doc_id", "prio")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got == twin)
    assert(got.nonEmpty)
  }

  test("sourceOverlap matches a driver recompute of the shared gram sets") {
    import spark.implicits._
    // B shares A's first sentence; C is disjoint content
    val shared = "the quick brown fox jumps over the lazy dog"
    val d = Seq(
      (0L, shared + " alpha beta gamma", "A"),
      (1L, "delta " + shared + " epsilon", "B"),
      (2L, "zzz yyy xxx www vvv uuu ttt sss", "C"),
      (3L, "completely different content here", "A")
    ).toDF("doc_id", "text", "source")
    val got = CurationQueries.sourceOverlap(d)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    // pure-Scala twin of the portable polynomial: hash of the 8 chars at
    // position i is sum(ascii(c_k) * 31^k) mod p
    def grams(t: String): Set[Long] =
      (0 to t.length - 8).map { i =>
        (0 until 8).map(k => t.charAt(i + k).toLong *
          math.pow(31, k).toLong).sum % 1000000007L
      }.toSet
    val bySrc = Seq("A" -> (grams(shared + " alpha beta gamma") ++
        grams("completely different content here")),
      "B" -> grams("delta " + shared + " epsilon"),
      "C" -> grams("zzz yyy xxx www vvv uuu ttt sss")).toMap
    val want = Seq(("A", "B"), ("A", "C"), ("B", "C")).flatMap { case (x, y) =>
      val inter = (bySrc(x) & bySrc(y)).size.toLong
      if (inter == 0) None
      else Some((x, y, bySrc(x).size.toLong, bySrc(y).size.toLong, inter,
        inter.toDouble / (bySrc(x).size + bySrc(y).size - inter)))
    }
    assert(got.toSeq == want)
    // the planted A/B overlap is found; C shares nothing
    assert(got.exists(r => r._1 == "A" && r._2 == "B" && r._5 > 30))
    assert(!got.exists(r => r._2 == "C" || r._1 == "C"))
  }

  test("distinctiveTerms: owned vocabulary scores 10^6, df gate drops rare tokens, boundary ties kept") {
    import spark.implicits._
    // shared vocabulary spread over both sources + a token OWNED by srcA;
    // every token below appears in >= 5 distinct docs except "rare"
    def mk(id: Long, src: String, text: String) = (id, text, src)
    val docs = ((0L until 6L).map(i => mk(i, "srcA", "common alpha owned")) ++
      (6L until 12L).map(i => mk(i, "srcB", "common alpha")) ++
      Seq(mk(12L, "srcA", "rare"))).toDF("doc_id", "text", "source")
    val got = CurationQueries.distinctiveTerms(docs, k = 2, minDf = 5L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(4)))
    val a = got.filter(_._1 == "srcA").map(t => t._2 -> t._3).toMap
    // srcA owns "owned" outright: 6/6 occurrences -> 10^6; shares
    // common/alpha at 6/12 -> 500000, a two-way TIE at the k=2 boundary
    // -> BOTH kept (rank<=k-with-ties semantics)
    assert(a("owned") == 1000000L)
    assert(a("common") == 500000L && a("alpha") == 500000L)
    assert(!a.contains("rare"), "df < 5 token must be gated out")
    val b = got.filter(_._1 == "srcB").map(t => t._2 -> t._3).toMap
    assert(b == Map("common" -> 500000L, "alpha" -> 500000L))
  }

  test("lengthOutlierFences: planted long doc past the high fence, hand-checked quartiles") {
    import spark.implicits._
    val mk = (n: Int) => Seq.fill(n)("w").mkString(" ")
    // source A: lengths 10..21 plus one 500-token doc. n=13 -> q1 at
    // rank ceil(13/4)=4 (value 13), q3 at rank ceil(39/4)=10 (value 19);
    // IQR=6 -> fences: 2n<8 (none) and 2n>56 (only the 500)
    val rows = (0 until 12).map(i => (i.toLong, mk(10 + i), "A")) :+
      (12L, mk(500), "A")
    val got = CurationQueries.lengthOutlierFences(rows.toDF("doc_id", "text", "source"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(("A", 13L, 19L, 0L, 1L)))
  }

  test("lengthOutlierFences equals its ranking-window twin on the real table") {
    import org.apache.spark.sql.expressions.Window
    val d = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val got = CurationQueries.lengthOutlierFences(d)
    val base = d.select(col("source"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val w = Window.partitionBy(col("source")).orderBy(col("n_tokens"))
    val q = base
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("source"))))
      .groupBy(col("source"))
      .agg(max(when(col("rk") === expr("(n + 3) div 4"),
        col("n_tokens"))).as("q1"),
        max(when(col("rk") === expr("(3 * n + 3) div 4"),
          col("n_tokens"))).as("q3"))
    val want = base.join(q, Seq("source"))
      .groupBy(col("source"))
      .agg(max(col("q1")).as("q1"), max(col("q3")).as("q3"),
        sum((col("n_tokens") * 2 <
          col("q1") * 2 - (col("q3") - col("q1")) * 3).cast("long"))
          .as("n_low_outliers"),
        sum((col("n_tokens") * 2 >
          col("q3") * 2 + (col("q3") - col("q1")) * 3).cast("long"))
          .as("n_high_outliers"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("incrementalDedup flags exact, cross-corpus and in-batch duplicates") {
    import spark.implicits._
    val a = (0 until 30).map(j => s"alpha$j").mkString(" ")
    val aNear = ((0 until 29).map(j => s"alpha$j") :+ "CHANGED").mkString(" ")
    val fresh = (0 until 30).map(j => s"zeta$j").mkString(" ")
    val batchDup = (0 until 30).map(j => s"beta$j").mkString(" ")
    val existing = Seq((1L, a), (2L, (0 until 30).map(j => s"gamma$j").mkString(" ")))
      .toDF("doc_id", "text")
    val incoming = Seq(
      (10L, a),        // exact copy of existing 1 (also a near match)
      (11L, aNear),    // near-dup of existing 1 (29/31 tokens shared)
      (12L, fresh),    // no relation to anything
      (13L, batchDup), // in-batch duplicate pair
      (14L, batchDup)
    ).toDF("doc_id", "text")
    val got = CurationQueries.incrementalDedup(existing, incoming)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == Set(10L, 11L, 12L, 13L, 14L),
      "every incoming doc reports, matched or not")
    assert(got(10L) == ((1L, 1L, 1L)),
      "exact copy: matches existing 1, near-matches batch doc 11, exact flag")
    assert(got(11L) == ((1L, 1L, 0L)),
      "near-dup: matches existing 1 and batch doc 10, no exact flag")
    assert(got(12L) == ((0L, 0L, 0L)), "fresh doc is clean")
    assert(got(13L) == ((0L, 1L, 0L)) && got(14L) == ((0L, 1L, 0L)),
      "in-batch pair: each flags the other, existing corpus untouched")
  }

  test("probe-only incrementalDedup equals the union shape: colliding ids, hot tokens, both guard paths") {
    import spark.implicits._
    // vocab-16 corpus: EVERY token's posting list is hot at
    // heavyListThreshold=2, driving the salted probe + salted prefix
    // paths; at 4096 everything rides the light paths — all three runs
    // must agree with the side-encoded union formulation
    val rnd = new scala.util.Random(11)
    def doc() = (0 until 25).map(_ => s"w${rnd.nextInt(16)}").mkString(" ")
    val exDocs = (0L until 40L).map(i => (i, doc()))
    // incoming ids 0..9 COLLIDE with existing ids (the union shape's
    // parity encoding exists for this; the probe shape keeps sides
    // separate) — plus planted exact (5→ex7) and in-batch (8,9) dups
    val inDocs = (0L until 8L)
      .map(i => if (i == 5L) (i, exDocs(7)._2) else (i, doc())) ++
      Seq((8L, "q1 q2 q3 q4 q5"), (9L, "q1 q2 q3 q4 q5"))
    val existing = exDocs.toDF("doc_id", "text")
    val incoming = inDocs.toDF("doc_id", "text")
    def run(f: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
                Double, Int) => org.apache.spark.sql.DataFrame, t: Int) =
      f(existing, incoming, 0.8, t).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    val union = run(CurationQueries.incrementalDedupUnionShape, 2)
    assert(run(CurationQueries.incrementalDedup, 2) == union,
      "salted probe path diverges from the union shape")
    assert(run(CurationQueries.incrementalDedup, 4096) == union,
      "light probe path diverges from the union shape")
    // sanity: the planted dups actually fired (the fixture isn't vacuous)
    val byId = union.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(byId(5L)._1 >= 1L && byId(5L)._3 == 1L, "exact cross dup missed")
    assert(byId(8L)._2 == 1L && byId(9L)._2 == 1L, "in-batch pair missed")
  }

  test("leakageSafeSplit: duplicate groups never straddle train/test") {
    import spark.implicits._
    // 200 docs, edges chaining docs into 3-doc groups (0,1,2), (10,11,12)…
    // plus isolated singletons
    val docs = (0L until 200L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val edges = (0L until 200L by 10L).flatMap(b =>
      Seq((b, b + 1), (b + 1, b + 2))).toDF("u", "v")
    val got = CurationQueries.leakageSafeSplit(docs, edges, testPerMille = 300)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.length == 200)
    // every member of a component shares its split
    got.groupBy(_._2).foreach { case (c, rs) =>
      assert(rs.map(_._3).distinct.length == 1, s"component $c straddles")
    }
    // chained groups resolved: doc b..b+2 share component b
    (0L until 200L by 10L).foreach { b =>
      val members = got.filter(t => t._1 >= b && t._1 <= b + 2)
      assert(members.map(_._2).distinct.toSeq == Seq(b))
    }
    // both splits actually occur at 30 %
    val frac = got.count(_._3 == "test").toDouble / got.length
    assert(frac > 0.1 && frac < 0.5, s"test fraction $frac")
  }

  test("gramNovelty: duplicates score 0, fresh content 1, mixes between") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val fresh = "XYZQWERTYUIOPASDFGHJKLZXCVBNM0123456789xyzqwertyuiop"
    val half = base.substring(0, 30) + "ZZGGHHJJKKLLPPOOIIUUYYTTRREEWWQQ"
    val corpus = Seq(
      (0L, base), (1L, base),    // 1 is an exact duplicate of 0
      (2L, fresh),               // nothing shared with 0/1
      (3L, half),                // shares its first half with 0
      (4L, "short")              // < 8 chars: excluded
    ).toDF("doc_id", "text")
    val got = CurationQueries.gramNovelty(corpus)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(!got.contains(4L), "sub-gram-length docs are excluded")
    assert(got(0L)._3 == 1.0, "first doc is all-novel")
    assert(got(1L)._3 == 0.0, "exact duplicate is all-stale")
    assert(got(2L)._3 == 1.0, "disjoint alphabet is all-novel")
    assert(got(3L)._3 > 0.0 && got(3L)._3 < 1.0, "partial overlap in between")
    // stale counts are consistent with totals
    got.values.foreach { case (n, stale, nov) =>
      assert(stale >= 0 && stale <= n)
      assert(math.abs(nov - (1.0 - stale.toDouble / n)) < 1e-6)
    }
  }

  private def exactOverlap(d: String): Map[(String, String), Double] =
    CurationQueries.sourceOverlap(graft.sources.Tables.documents(spark, d))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(5)).toMap

  test("kmvOverlap with k >= universe degenerates to the exact Jaccard matrix") {
    // when every sketch holds its source's FULL distinct hash set, the
    // coincidence ratio IS the exact Jaccard — same pairs, same value
    val d = "/root/testdata/sf0.001"
    val got = CurationQueries.kmvOverlap(
      graft.sources.Tables.documents(spark, d), k = 1 << 20)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(6)).toMap
    val want = exactOverlap(d)
    assert(got.keySet == want.keySet)
    got.foreach { case (k0, est) =>
      assert(math.abs(est - want(k0)) < 1e-6, s"$k0: $est vs ${want(k0)}")
    }
  }

  test("kmvOverlap at k=256 estimates within KMV error bounds") {
    val d = "/root/testdata/sf0.001"
    val rows = CurationQueries.kmvOverlap(
      graft.sources.Tables.documents(spark, d), k = 256).collect()
    val want = exactOverlap(d)
    // std err of the coincidence ratio is ~sqrt(J(1-J)/k) <= 0.032 at
    // k=256; 5 sigma with margin
    rows.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      val est = r.getDouble(6)
      assert(math.abs(est - want(key)) < 0.16, s"$key: est $est vs ${want(key)}")
      assert(r.getInt(4) <= 256 && r.getInt(5) <= r.getInt(4))
    }
  }

  test("tokenDiversity: hand-computed TTR, Simpson and hapax on a tiny corpus") {
    import spark.implicits._
    // source s: tokens a a a b b c  -> m=6, v=3, hapax=1 (c),
    // coll = 3*2 + 2*1 + 0 = 8, simpson = 8/30
    val docs = Seq(
      (0L, "s", "a a a b"), (1L, "s", "b c"),
      (2L, "t", "x y z w")                         // all hapax
    ).toDF("doc_id", "source", "text")
    val got = CurationQueries.tokenDiversity(docs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(got("s") == (6L, 3L, 3.0 / 6, 8.0 / 30, 1.0 / 3))
    assert(got("t") == (4L, 4L, 1.0, 0.0, 1.0))
  }

  test("corpusDiff classifies every status exactly") {
    import spark.implicits._
    val prev = Seq(
      (1L, "s", "kept the same"),
      (2L, "s", "old wording here"),
      (3L, "t", "will be deleted"),
      (5L, "t", "same in both")
    ).toDF("doc_id", "source", "text")
    val cur = Seq(
      (1L, "s", "kept the same"),        // unchanged
      (2L, "s", "new wording here"),     // changed
      (4L, "s", "freshly scraped"),      // added
      (5L, "t", "same in both")          // unchanged
    ).toDF("doc_id", "source", "text")
    val got = CurationQueries.corpusDiff(prev, cur)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("s", "added") -> 1L, ("s", "changed") -> 1L, ("s", "unchanged") -> 1L,
      ("t", "removed") -> 1L, ("t", "unchanged") -> 1L))
  }

  test("q113 snapshot-derivation buckets produce the expected status mix") {
    val d = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.documents(spark, d)
    val byBucket = docs.select(
        ((col("doc_id") % 1000000007L) * 2654435761L % 1000000007L % 5).as("b"))
      .groupBy("b").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = CurationQueries.registry("q113_corpus_diff").build(spark, d)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    def tot(status: String) = got.collect { case ((_, s), n) if s == status => n }.sum
    assert(tot("added") == byBucket.getOrElse(0L, 0L))
    assert(tot("changed") == byBucket.getOrElse(1L, 0L))
    assert(tot("removed") == byBucket.getOrElse(2L, 0L))
    assert(tot("unchanged") ==
      byBucket.getOrElse(2L, 0L) + byBucket.getOrElse(3L, 0L) + byBucket.getOrElse(4L, 0L))
  }
}
