package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge cases for the r5 native text expressions, pinned against the
  * Column/driver-side formulations they replaced. */
class NativeTextExprSpec extends SparkSpec {

  private def gramHashRef(s: String, gramLen: Int, stride: Int): Seq[Long] = {
    if (s.length < gramLen) return Seq.empty
    (0 to s.length - gramLen by stride).map { i =>
      (0 until gramLen).map(k => s.charAt(i + k).toLong *
        math.pow(31, k).toLong).sum % 1000000007L
    }
  }

  test("GramHashArray matches the reference walk incl. edges") {
    import spark.implicits._
    val texts = Seq("", "a", "exactly8", "short", "a bc def ghij klmno",
      "the quick brown fox jumps over the lazy dog", "aaaaaaaaaa",
      "x" * 7, "x" * 8, "x" * 9)
    for (stride <- Seq(1, 4)) {
      val got = texts.toDF("text")
        .select(GramHashArray(col("text"), 8, stride).as("g"))
        .collect().map(_.getAs[scala.collection.Seq[Long]](0).toSeq)
      val want = texts.map(gramHashRef(_, 8, stride))
      assert(got.toSeq === want, s"stride=$stride")
    }
  }

  test("GramHashArray: null text yields null") {
    import spark.implicits._
    val r = Seq(Option.empty[String]).toDF("text")
      .select(GramHashArray(col("text")).as("g")).collect().head
    assert(r.isNullAt(0))
  }

  test("TokenNgramStats matches split-semantics reference incl. empty tokens") {
    import spark.implicits._
    def ref(s: String, n: Int): (Long, Long) = {
      val toks = s.split(" ", -1).toSeq
      val grams = toks.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSeq
      (grams.length.toLong, grams.distinct.length.toLong)
    }
    val texts = Seq("", "a", "a b", "a b c", "a b c a b c a b c",
      "a  b   c", " leading", "trailing ", "a b c d e")
    val got = texts.toDF("text")
      .select(TokenNgramStats(col("text"), 3).as("st"))
      .collect().map(r => { val s = r.getStruct(0); (s.getLong(0), s.getLong(1)) })
    assert(got.toSeq === texts.map(ref(_, 3)))
  }

  test("SpanFingerprints matches the reference walk; anchoring is offset-free") {
    import spark.implicits._
    def ref(s: String): Set[Long] = {
      if (s.length < 64) return Set.empty
      val g = (0 to s.length - 8).map(i =>
        (0 until 8).map(k => s.charAt(i + k).toLong * math.pow(31, k).toLong)
          .sum % 1000000007L)
      (0 to s.length - 64).map(i =>
        (0 until 8).map(j => g(i + 8 * j)).sum % 1000000007L)
        .filter(_ % 8 == 0).toSet
    }
    val span = "z" * 10 + (0 until 20).map(i => s"core$i").mkString(" ") + "y" * 10
    val texts = Seq("", "short", "x" * 63, "x" * 64,
      "prefix " + span, "a much longer and different prefix " + span)
    val got = texts.toDF("text")
      .select(SpanFingerprints(col("text")).as("w"))
      .collect().map(_.getAs[scala.collection.Seq[Long]](0).toSet)
    assert(got.toSeq === texts.map(ref))
    // the shared span sits at offsets differing by 28 (not a multiple of
    // 8) — content anchoring must still produce common fingerprints
    assert((got(4) intersect got(5)).nonEmpty)
  }

  test("GramHashArray/SpanFingerprints hash CODEPOINTS: non-BMP text matches ascii(substr) form") {
    import spark.implicits._
    // emoji are surrogate PAIRS in UTF-16: a code-unit walk would shift
    // every window position after one and hash surrogate halves; the
    // codepoint walk must agree with the interpreted ascii(substr(...))
    // Column form (Spark substr/ascii are codepoint-based, like DuckDB's)
    val texts = Seq(
      "café with 😀 emoji and more text to cover spans",
      "😀😁😂 leading emoji then plain ascii text",
      ("pad " * 12) + "😀 shared span sits here with plenty of characters " + ("tail " * 12))
    val gramHashCol = transform(
      sequence(lit(1), greatest(length(col("text")) - 7, lit(0))),
      i => (0 until 8).map(k =>
        ascii(col("text").substr(i + lit(k), lit(1))).cast("long") *
          lit(math.pow(31, k).toLong)).reduce(_ + _) % lit(1000000007L))
    val rows = texts.toDF("text")
      .select(GramHashArray(col("text")).as("native"), gramHashCol.as("interp"))
      .collect()
    rows.zip(texts).foreach { case (r, t) =>
      assert(r.getAs[scala.collection.Seq[Long]](0).toSeq ===
        r.getAs[scala.collection.Seq[Long]](1).toSeq, s"text: $t")
    }
    // spans: offset-free anchoring must survive non-BMP content — the
    // shared emoji-bearing span sits at different offsets in both docs
    val span = "😀 the shared boilerplate block " + ("s" * 40) + " 😂 end"
    val a = "intro " + span
    val b = "a different and much longer introduction " + span
    val got = Seq(a, b).toDF("text")
      .select(SpanFingerprints(col("text")).as("w"))
      .collect().map(_.getAs[scala.collection.Seq[Long]](0).toSet)
    assert((got(0) intersect got(1)).nonEmpty, "common span fingerprints")
  }

  test("TokenHashArray matches the interpreted ascii(substring) form incl. edges") {
    import spark.implicits._
    // adversarial splits: multi-space (empty segment), leading/trailing
    // space, empty text, exactly-16 and >16-char tokens (truncation),
    // single char, unicode
    val rows = Seq("the quick brown fox", "a  b", " lead", "trail ", "",
      "x", "abcdefghijklmnop", "abcdefghijklmnopqrstuvwxyz",
      "café über tøkens", "same same same")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = rows.toDF("doc_id", "text")
    val native = df.select(col("doc_id"),
      graft.functions.TokenHashArray(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val interp = df.select(col("doc_id"),
      transform(split(col("text"), " "),
        w => graft.operators.DedupQueries.tokenHash(w)).as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native == interp,
      "compiled token hashes == interpreted Column form, segment for segment")
    // oracle parity on the same strings: DuckDB re-derives via
    // tokenHashSql — covered end-to-end by the q128/q132 gate; here pin
    // the shape: one hash per ' '-separated segment, empties included
    assert(native(1L).size == 3 && native(4L).size == 1)
    // truncation: first 16 chars decide the hash
    assert(native(6L) == native(7L).take(1) ||
      native(6L).head == native(7L).head,
      ">16-char tokens truncate to the 16-char prefix hash")
  }

  test("CollapseBarrier is transparent for values and nulls") {
    import spark.implicits._
    val out = Seq(Some(1), None, Some(3)).toDF("x")
      .select(CollapseBarrier(col("x") * 2).as("y"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(out.toSeq === Seq(Some(2), None, Some(6)))
  }

  test("IntersectSizeOps counts set cardinality like array_intersect+size") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(200)((
      Seq.fill(rnd.nextInt(12))(rnd.nextInt(8).toString),
      Seq.fill(rnd.nextInt(12))(rnd.nextInt(8).toString)))
    val df = rows.toDF("x", "y")
    val native = df.select(
      org.apache.spark.sql.graft.ColumnBridge.column(IntersectSize(
        org.apache.spark.sql.graft.ColumnBridge.expression(col("x")),
        org.apache.spark.sql.graft.ColumnBridge.expression(col("y")))))
      .collect().map(_.getInt(0))
    val want = rows.map { case (a, b) => a.toSet.intersect(b.toSet).size }
    assert(native.toSeq === want)
  }
}
