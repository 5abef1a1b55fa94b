package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class AnnMultimodalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("IVF ANN with nprobe=1 matches brute force restricted to the probed cell") {
    val e = Tables.embeddings(spark, sf)
    val probe = e.orderBy(col("vec_id")).limit(1)
    val ivf = AnnQueries.ivfSearch(e, probe, k = 5, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(ivf.length == 5)
    // results sorted by similarity desc
    assert(ivf.sliding(2).forall(w => w(0)._2 >= w(1)._2))
    // raising nprobe to all cells == global brute force
    val full = AnnQueries.ivfSearch(e, probe, k = 5, nprobe = 100)
      .collect().map(_.getLong(0))
    val brute = TextQueries.registry("q26_embed_knn").build(spark, sf)
      .limit(5).collect().map(_.getLong(0))
    assert(full.toSeq == brute.toSeq)
  }

  test("knnJoin equals a driver-side brute-force kNN; LSH twin finds planted twins") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val n = 80
    val vecs = (0L until n.toLong).map { i =>
      // 59 owns a planted exact duplicate at 79 (same vector bytes)
      val v = if (i == 79L) null else Array.fill(16)(rnd.nextFloat() * 2 - 1)
      (i, v, (i % 4).toInt)
    }
    val filled = {
      val dup = vecs(59)._2
      vecs.map { case (i, v, l) => (i, if (v == null) dup else v, l) }
    }
    val df = filled.toDF("vec_id", "embedding", "label")
    val got = AnnQueries.knnJoin(df, k = 3, blocks = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    // driver brute force with the same scaled-integer rank order
    val data = filled.map { case (i, v, _) => (i, v.map(_.toDouble)) }
    def cosScaled(a: Array[Double], b: Array[Double]): Long = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val nm = math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)
      math.round(dot / nm * 1e6)
    }
    val want = data.flatMap { case (i, v) =>
      data.filter(_._1 != i)
        .map { case (j, w) => (j, cosScaled(v, w)) }
        .sortBy { case (j, c) => (-c, j) }
        .take(3).zipWithIndex
        .map { case ((j, c), rk) => (i, rk + 1, j, c) }
    }.sortBy(t => (t._1, t._2))
    assert(got.toSeq == want)
    // planted duplicates rank each other first at cos 1.0
    assert(got.find(_._1 == 59L).get._3 == 79L)
    assert(got.find(_._1 == 79L).get._3 == 59L)
    assert(got.find(_._1 == 59L).get._4 == 1000000L)
    // LSH twin: identical vectors share every signature bucket, so the
    // planted twins MUST find each other at rank 1 there too, and every
    // LSH neighbour's score must match the exact join's score for that
    // (vec, neighbour) pair
    val lsh = AnnQueries.knnJoinLsh(df, k = 3, planes = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(lsh.find(_._1 == 59L).get._3 == 79L)
    assert(lsh.find(_._1 == 79L).get._3 == 59L)
    val exactScore = want.map(t => (t._1, t._3) -> t._4).toMap
    val allScores = data.flatMap { case (i, v) =>
      data.filter(_._1 != i).map { case (j, w) => (i, j) -> cosScaled(v, w) }
    }.toMap
    lsh.foreach { case (i, _, j, c) => assert(allScores((i, j)) == c) }
    // LSH neighbours are a subset ranking: each vec's LSH list is ordered
    lsh.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(_._2).map(_._4)
      assert(sorted.sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
    }
  }

  test("knnRecall: bounds hold, planted identical twins always count as hits") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val vecs = (0L until 50L).map { i =>
      (i, Array.fill(12)(rnd.nextFloat() * 2 - 1), 0)
    }
    // 17 and 42 share identical vectors -> identical signatures -> the
    // LSH join must surface the pair, and each ranks the other first in
    // the exact join, so both rows contribute at least one hit
    val planted = vecs.map { case (i, v, l) =>
      (i, if (i == 42L) vecs(17)._2 else v, l)
    }
    val df = planted.toDF("vec_id", "embedding", "label")
    val got = AnnQueries.knnRecall(df, k = 3, planes = 8, blocks = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == 50)
    got.foreach { case (_, ne, nh, rec) =>
      assert(ne == 3L && nh >= 0L && nh <= ne)
      assert(math.abs(rec - nh.toDouble / ne) < 1e-12)
    }
    assert(got.find(_._1 == 17L).get._3 >= 1L)
    assert(got.find(_._1 == 42L).get._3 >= 1L)
    // recall agrees with a driver recompute from the two join outputs
    def pairs(dfq: org.apache.spark.sql.DataFrame) = dfq.collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = pairs(AnnQueries.knnJoin(df, k = 3, blocks = 4))
    val approx = pairs(AnnQueries.knnJoinLsh(df, k = 3, planes = 8,
      signatures = AnnQueries.signSignaturesPortable))
    val wantHits = exact.groupBy(_._1).map { case (id, es) =>
      id -> es.count(approx.contains).toLong
    }
    got.foreach { case (id, _, nh, _) => assert(nh == wantHits(id)) }
  }

  test("semDeDup: planted twins resolve keep-first; matches driver recompute; blocking-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val n = 60
    val base = (0L until n.toLong).map { i =>
      (i, Array.fill(12)(rnd.nextFloat() * 2 - 1), 0)
    }
    // plant an exact duplicate pair (7, 41) and a triple (12, 30, 55)
    val planted = base.map {
      case (41L, _, l) => (41L, base(7)._2, l)
      case (30L, _, l) => (30L, base(12)._2, l)
      case (55L, _, l) => (55L, base(12)._2, l)
      case t => t
    }
    val df = planted.toDF("vec_id", "embedding", "label")
    // tau high enough that only identical vectors pair
    val got = AnnQueries.semDeDup(df, kCells = 4, iters = 2,
      tauScaled = 999999L, blocks = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    val byId = got.map(t => t._1 -> t).toMap
    // keep-first: min id of each planted group kept, the rest dropped
    assert(byId(7L) == (7L, 1L, 1L) && byId(41L) == (41L, 1L, 0L))
    assert(byId(12L) == (12L, 2L, 1L))
    assert(byId(30L) == (30L, 2L, 0L) && byId(55L) == (55L, 2L, 0L))
    // everyone else untouched
    assert(got.filter(t => !Set(7L, 41L, 12L, 30L, 55L)(t._1))
      .forall(t => t._2 == 0L && t._3 == 1L))
    // driver recompute from the SAME cells at a looser tau: identical
    // decisions (cells collected once — k-means is deterministic)
    val tau = 500000L
    val cells = AnnQueries.kmeansCells(df, k = 4, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val vecs = planted.map { case (i, v, _) => i -> v.map(_.toDouble) }.toMap
    def cosScaled(a: Array[Double], b: Array[Double]): Long = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val nm = math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)
      math.round(dot / nm * 1e6)
    }
    val ids = planted.map(_._1)
    val nbrs = ids.map { i =>
      i -> ids.filter(j => j != i && cells(j) == cells(i) &&
        cosScaled(vecs(i), vecs(j)) >= tau)
    }.toMap
    val want = ids.sorted.map { i =>
      val nb = nbrs(i)
      (i, nb.size.toLong, if (nb.exists(_ < i)) 0L else 1L)
    }
    val loose = AnnQueries.semDeDup(df, kCells = 4, iters = 2,
      tauScaled = tau, blocks = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(loose.toSeq == want)
    // triangle cover is output-invariant in the block count
    val b1 = AnnQueries.semDeDup(df, kCells = 4, iters = 2,
      tauScaled = tau, blocks = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(b1.toSeq == loose.toSeq)
  }

  test("auto-scaled knobs: occupancy/sqrt rules; semantics hold at the scaled values") {
    import spark.implicits._
    // the rules produce their documented values and grow monotonically
    assert(AnnQueries.planesFor(128) == 2, "occupancy floor")
    assert(AnnQueries.planesFor(2000) == 4, "the registered bench point")
    assert(AnnQueries.planesFor(1L << 20) == 13, "2^20/128 buckets")
    assert(AnnQueries.planesFor(3000000000L) > AnnQueries.planesFor(1000000L))
    assert(AnnQueries.kCellsFor(4) == 8 && AnnQueries.kCellsFor(1000000) == 1000)
    // semantics at the SCALED knob values (not the registry literals):
    // identical vectors always share every signature bucket and every
    // k-means cell, so planted twins must behave identically under any
    // knob the rules emit
    val rnd = new scala.util.Random(31)
    val vecs = (0L until 80L).map { i =>
      (i, Array.fill(12)(rnd.nextFloat() * 2 - 1), 0)
    }
    val planted = vecs.map {
      case (79L, _, l) => (79L, vecs(59)._2, l)
      case t => t
    }
    val df = planted.toDF("vec_id", "embedding", "label")
    val lsh = AnnQueries.knnJoinLsh(df, k = 3,
        planes = AnnQueries.planesFor(80), probeFlips = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(lsh.find(_._1 == 59L).get._3 == 79L)
    assert(lsh.find(_._1 == 79L).get._3 == 59L)
    // every reported score equals the exact cosine for that pair
    val data = planted.map { case (i, v, _) => i -> v.map(_.toDouble) }.toMap
    def cosScaled(a: Array[Double], b: Array[Double]): Long = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val nm = math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)
      math.round(dot / nm * 1e6)
    }
    lsh.foreach { case (i, _, j, c) => assert(cosScaled(data(i), data(j)) == c) }
    val sd = AnnQueries.semDeDup(df, kCells = AnnQueries.kCellsFor(80),
        iters = 2, tauScaled = 999999L, blocks = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(sd(59L) == ((1L, 1L)) && sd(79L) == ((1L, 0L)),
      "keep-first must hold at the sqrt-scaled cell count")
    assert(sd.filter(t => t._1 != 59L && t._1 != 79L)
      .forall(_._2 == ((0L, 1L))))
  }

  test("k-means IVF: probing all cells == brute force; one cell is a subset") {
    val e = Tables.embeddings(spark, sf)
    val probe = e.orderBy(col("vec_id")).limit(1)
    val brute = TextQueries.registry("q26_embed_knn").build(spark, sf)
      .limit(5).collect().map(_.getLong(0))
    val all = AnnQueries.ivfSearchKmeans(e, probe, k = 5, nprobe = 100)
      .collect().map(_.getLong(0))
    assert(all.toSeq == brute.toSeq)
    // nprobe=1 restricts to one Lloyd cell: non-empty, ranked by cosine
    // (cell CHOICE is by cosine-vs-centroid; the probe's own euclidean
    // cell isn't guaranteed to win, so membership is not asserted)
    val one = AnnQueries.ivfSearchKmeans(e, probe, k = 5, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(one.nonEmpty)
    assert(one.sliding(2).forall(w => w.length < 2 || w(0)._2 >= w(1)._2))
  }

  test("sign-LSH ANN: planted duplicate always retrieved; ranking consistent") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sf)
    val probe = e.orderBy(col("vec_id")).limit(1)
    // plant an exact duplicate of the probe under a fresh id: identical
    // vectors project identically -> same signature bucket -> must be found
    // with cosine 1.0
    val probeRow = probe.collect().head
    val dup = Seq((99999L,
      probeRow.getAs[scala.collection.Seq[Float]]("embedding").toSeq,
      probeRow.getAs[Int]("label"))).toDF("vec_id", "embedding", "label")
    val planted = e.unionByName(dup)
    val got = AnnQueries.lshSearch(planted, probe, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.map(_._1).contains(99999L))
    assert(got.find(_._1 == 99999L).get._2 == 1.0)
    // sorted by cosine desc, and every candidate's similarity is a real
    // cosine also produced by the brute-force scan (containment check)
    assert(got.sliding(2).forall(w => w(0)._2 >= w(1)._2))
    val brute = TextQueries.registry("q26_embed_knn").build(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    got.filter(_._1 != 99999L).foreach { case (id, sim) =>
      brute.get(id).foreach(bs => assert(bs == sim))
    }
  }

  test("portable sign-LSH: planted duplicate retrieved; integer projections deterministic") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sf)
    val probe = e.orderBy(col("vec_id")).limit(1)
    val probeRow = probe.collect().head
    val dup = Seq((99999L,
      probeRow.getAs[scala.collection.Seq[Float]]("embedding").toSeq,
      probeRow.getAs[Int]("label"))).toDF("vec_id", "embedding", "label")
    val planted = e.unionByName(dup)
    val got = AnnQueries.lshSearch(planted, probe, k = 10, planes = 8,
        signatures = AnnQueries.signSignaturesPortable)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.map(_._1).contains(99999L), s"got ${got.toSeq}")
    assert(got.find(_._1 == 99999L).get._2 == 1.0)
    assert(got.sliding(2).forall(w => w(0)._2 >= w(1)._2))
    // integer projections: signature identical across runs and in range
    val a = AnnQueries.signSignaturesPortable(e, 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = AnnQueries.signSignaturesPortable(e, 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    assert(a.values.forall(s => s >= 0L && s < (1L << 8)))
  }

  test("signatures: 16-bit range, deterministic across invocations") {
    val e = Tables.embeddings(spark, sf)
    val a = AnnQueries.signSignatures(e).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = AnnQueries.signSignatures(e).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    assert(a.values.forall(s => s >= 0L && s < (1L << 16)))
    assert(a.values.toSet.size > 1) // not everything in one bucket
  }

  test("k-means cells: deterministic, total, and inertia non-increasing") {
    val e = Tables.embeddings(spark, sf)
    val n = e.count()
    val a1 = AnnQueries.kmeansCells(e, k = 8, iters = 1)
    val a3 = AnnQueries.kmeansCells(e, k = 8, iters = 3)
    // total assignment: every vector lands in exactly one cell
    assert(a3.count() == n)
    assert(a3.select("vec_id").distinct().count() == n)
    // Lloyd's algorithm never increases total inertia
    def total(a: org.apache.spark.sql.DataFrame) =
      AnnQueries.kmeansInertia(e, a)
        .agg(org.apache.spark.sql.functions.sum("inertia")).collect().head.getDouble(0)
    assert(total(a3) <= total(a1) + 1e-6)
    // deterministic across invocations
    val again = AnnQueries.kmeansCells(e, k = 8, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val first = a3.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(first == again)
  }

  test("centroids: one row per cell, dimension-complete") {
    val c = AnnQueries.centroids(Tables.embeddings(spark, sf)).collect()
    assert(c.length == 10)
    assert(c.forall(_.getAs[scala.collection.Seq[Double]]("centroid").length == 64))
  }

  test("multimodal pipeline: real BMP wrap -> decode roundtrip, features bounded") {
    val media = MultimodalQueries.bmpMediaTable(spark, sf)
    val meta = MultimodalQueries.decodeMeta(media).collect()
    assert(meta.length == media.count()) // every wrapped payload decodes
    assert(meta.forall(m => m.width == MultimodalQueries.BmpWrapWidth && m.channels == 3))
    // raw (non-media) payloads are skipped, not failed
    assert(MultimodalQueries.decodeMeta(
      MultimodalQueries.mediaTable(spark, sf)).count() == 0)
    val feats = MultimodalQueries.extractFeatures(media).collect()
    assert(feats.forall(_.patch_means.length == 16))
    assert(feats.forall(_.patch_means.forall(v => v >= 0f && v <= 1f)))
  }

  test("resizeBlockSums: hand-checked box sums incl. padded stride and edge blocks") {
    import graft.functions.MediaCodec
    // 2x3 single-channel image, stride pads rows to 4 bytes; f=2 gives
    // one full block (rows 0-1) and one truncated edge block (row 2)
    val region = Array[Byte](1, 2, 99, 99, 3, 4, 99, 99, 5, 6, 99, 99)
    val sums = MediaCodec.resizeBlockSums(region, width = 2, height = 3,
      channels = 1, f = 2)
    assert(sums.toSeq == Seq(10L, 11L), "pad bytes must not leak into sums")
    // 3-channel path: channels interleave within a pixel
    val rgb = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8) // one row, 2 px, stride 8
    val s3 = MediaCodec.resizeBlockSums(rgb, width = 2, height = 1,
      channels = 3, f = 2)
    assert(s3.toSeq == Seq(1L + 4L, 2L + 5L, 3L + 6L))
  }

  test("frameEnergies: signed 16-bit decode, hop/window truncation") {
    import graft.functions.MediaCodec
    // samples: 100, -2 (le16: 254,255), 7
    val region = Array[Byte](100, 0, 254.toByte, 255.toByte, 7, 0)
    assert(MediaCodec.frameEnergies(region, win = 2, hop = 2).toSeq ==
      Seq(102L, 7L))
    assert(MediaCodec.frameEnergies(region, win = 1, hop = 2).toSeq ==
      Seq(100L, 7L))
    assert(MediaCodec.frameEnergies(Array.emptyByteArray).toSeq == Seq())
  }

  test("q101/q102 builders equal a driver recompute from the raw text bytes") {
    val d = "/root/testdata/sf0.001"
    val texts = spark.read.parquet(s"$d/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8")).toMap
    import graft.functions.MediaCodec
    val gotR = MultimodalQueries.registry("q101_media_resize").build(spark, d)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getString(6)))).toMap
    texts.foreach { case (id, bytes) =>
      val h = math.max(1, (bytes.length + 95) / 96)
      val region = java.util.Arrays.copyOf(bytes, 96 * h)
      val sums = MediaCodec.resizeBlockSums(region, 32, h, 3, 4)
      val (b0, md) = gotR(id)
      assert(b0 == sums(0))
      assert(md == java.security.MessageDigest.getInstance("MD5")
        .digest(sums.mkString(",").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
    }
    val gotF = MultimodalQueries.registry("q102_media_framesample").build(spark, d)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(3)))).toMap
    texts.foreach { case (id, bytes) =>
      val even = java.util.Arrays.copyOf(bytes, bytes.length / 2 * 2)
      val es = MediaCodec.frameEnergies(even)
      assert(gotF(id) == ((even.length / 2).toLong,
        if (es.isEmpty) 0L else es(0)))
    }
  }

  test("MediaCodec decodes the committed BMP fixture byte-exactly") {
    import graft.functions.MediaCodec
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/repo/fixtures/media/sample.bmp"))
    val d = MediaCodec.decode(bytes).get
    assert((d.format, d.width, d.height, d.channels) == (("bmp", 4, 2, 3)))
    // pixel array exactly as authored (bottom-up rows, BGR)
    val expected = Array[Int](
      255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255, // bottom row
      0, 0, 0, 128, 128, 128, 0, 255, 255, 255, 255, 0 // top row
    ).map(_.toByte)
    assert(d.region.toSeq == expected.toSeq)
    // first patch mean over 24 bytes: chunk = 1 byte -> region(0)/255
    assert(MediaCodec.patchMeans(d.region)(0) == 1.0f)
    // encode->decode roundtrip reproduces the identical pixel region
    val re = MediaCodec.decode(MediaCodec.encodeBmp24(4, 2, d.region)).get
    assert(re.region.toSeq == d.region.toSeq &&
      re.width == 4 && re.height == 2)
  }

  test("MediaCodec: corrupt headers decode to None, never throw") {
    import graft.functions.MediaCodec
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    // BMP with width=0x20000000, bpp=24: bpp/8*width would overflow Int
    val evilBmp = new Array[Byte](64)
    evilBmp(0) = 'B'; evilBmp(1) = 'M'
    System.arraycopy(le32(54), 0, evilBmp, 10, 4)
    System.arraycopy(le32(0x20000000), 0, evilBmp, 18, 4)
    System.arraycopy(le32(1), 0, evilBmp, 22, 4)
    evilBmp(28) = 24
    assert(MediaCodec.decode(evilBmp).isEmpty)
    // BMP with bpp=0: passes % 8 but is not a real pixel format
    val zeroBpp = MediaCodec.encodeBmp24(2, 2, new Array[Byte](16)).clone()
    zeroBpp(28) = 0; zeroBpp(29) = 0
    assert(MediaCodec.decode(zeroBpp).isEmpty)
    // BMP with height=Int.MinValue: abs() must not stay negative
    val minH = MediaCodec.encodeBmp24(2, 2, new Array[Byte](16)).clone()
    System.arraycopy(le32(Int.MinValue), 0, minH, 22, 4)
    assert(MediaCodec.decode(minH).isEmpty)
    // WAV chunk with size near 2^31: offset arithmetic must not wrap
    val evilWav = new Array[Byte](64)
    "RIFF".getBytes.copyToArray(evilWav, 0)
    "WAVE".getBytes.copyToArray(evilWav, 8)
    "data".getBytes.copyToArray(evilWav, 12)
    System.arraycopy(le32(0x7FFFFFF0), 0, evilWav, 16, 4)
    assert(MediaCodec.decode(evilWav).isEmpty)
    // and truncated/garbage payloads
    assert(MediaCodec.decode(Array[Byte]('B', 'M')).isEmpty)
    assert(MediaCodec.decode("not media at all".getBytes).isEmpty)
  }

  test("MediaCodec decodes the committed WAV fixture (chunk walk incl. LIST)") {
    import graft.functions.MediaCodec
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/repo/fixtures/media/sample.wav"))
    val d = MediaCodec.decode(bytes).get
    // width = sample rate, height = frames, channels
    assert((d.format, d.width, d.height, d.channels) == (("wav", 8000, 4, 2)))
    assert(d.region.length == 16)
    // first frame little-endian: L=0, R=100
    assert(d.region(0) == 0 && d.region(1) == 0 &&
      d.region(2) == 100.toByte && d.region(3) == 0)
  }

  test("q135 embedding decontamination equals the brute yardstick at full mask coverage") {
    val d = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.documents(spark, d)
    val evIds = docs.filter(col("source") === "src0")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val vecs = graft.sources.Tables.embeddings(spark, d)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    // precondition of the equality claim: at this corpus the derived
    // planes (2) with flips = 2 probe every one of the 4 buckets, so
    // ALL (eval, train) pairs are candidates and the verified output
    // must EQUAL the brute cosine threshold join — the strongest pin
    // available without re-deriving the LSH (which the oracle does)
    assert(AnnQueries.planesFor(vecs.size - evIds.size.toLong) == 2)
    def cosScaled(a: Array[Double], b: Array[Double]): Long = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val nm = math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)
      math.round(dot / nm * 1e6)
    }
    def norm0(a: Array[Double]): Boolean = a.map(x => x * x).sum == 0.0
    val brute = (for {
      (ti, tv) <- vecs.toSeq if !evIds(ti) && !norm0(tv)
      ei <- evIds if !norm0(vecs(ei))
      c = cosScaled(tv, vecs(ei)) if c >= 300000L
    } yield (ti, ei, c)).groupBy(_._1).map { case (ti, ms) =>
      val mc = ms.map(_._3).max
      ti -> (ms.size.toLong, ms.filter(_._3 == mc).map(_._2).min, mc)
    }
    val got = AnnQueries.registry("q135_embed_decontaminate")
      .build(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.nonEmpty, "the corpus plants embedding-space contamination")
    assert(got === brute)
  }

  test("embedDeconFlagsShared key contract: distinct taus distinct, huge taus fail loudly") {
    val d = "/root/testdata/sf0.001"
    val e = Tables.embeddings(spark, d)
    val docs = Tables.documents(spark, d)
    // two taus must resolve to two DIFFERENT cached relations
    val loose = AnnQueries.embedDeconFlagsShared(e, docs,
      tauScaled = 300000L).count()
    val tight = AnnQueries.embedDeconFlagsShared(e, docs,
      tauScaled = 450000L).count()
    assert(loose > 0 && tight < loose,
      "a tighter tau yields strictly fewer flags — no cache collision")
    // a tau past Int range fails loudly instead of truncating into a
    // colliding cache key (the r10 second-review contract)
    intercept[ArithmeticException] {
      AnnQueries.embedDeconFlagsShared(e, docs,
        tauScaled = 300000L + (1L << 32)).count()
    }
  }
}
