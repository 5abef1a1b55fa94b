package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Range-refinement selection vs brute-force sorting, including the
  * degenerate distributions that stress bucket refinement: heavy ties,
  * single-element groups, full-long-range values, adversarial skew. */
class SelectionSpec extends SparkSpec {

  test("kthSmallest matches sort-based ground truth on random distributions") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val rows = (0 until 5000).map { i =>
      val g = s"g${i % 7}"
      val v = (i % 7) match {
        case 0 => rnd.nextLong() // full 64-bit range
        case 1 => rnd.nextInt(3).toLong // heavy ties
        case 2 => 42L // constant group
        case _ => rnd.nextInt(1000000).toLong - 500000
      }
      (g, v)
    } :+ (("solo", 7L)) // single-element group
    val df = rows.toDF("g", "v")
    for (kOf <- Seq[(Long => Long, String)]((n => (n + 1) / 2, "median"),
      (_ => 1L, "min"), (n => n, "max"), (n => math.max(1, n / 4), "q1"))) {
      val got = Selection.kthSmallest(df, "g", "v", kOf._1)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = rows.groupBy(_._1).map { case (g, rs) =>
        val sorted = rs.map(_._2).sorted
        g -> sorted(kOf._1(sorted.length).toInt - 1)
      }
      assert(got === want, kOf._2)
    }
  }

  test("kthSmallest rejects out-of-range k and null groups up front") {
    import spark.implicits._
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 9L)).toDF("g", "v")
    // k beyond the group size must fail immediately with the group named,
    // not surface rounds later as 'selection invariant broken'
    val tooBig = intercept[IllegalArgumentException] {
      Selection.kthSmallest(df, "g", "v", _ => 2L).collect()
    }
    assert(tooBig.getMessage.contains("'b'") &&
      tooBig.getMessage.contains("out of [1, 1]"))
    val tooSmall = intercept[IllegalArgumentException] {
      Selection.kthSmallest(df, "g", "v", _ => 0L).collect()
    }
    assert(tooSmall.getMessage.contains("out of"))
    val nullG = intercept[IllegalArgumentException] {
      Selection.kthSmallest(
        Seq((Option.empty[String], 5L), (Some("a"), 1L)).toDF("g", "v"),
        "g", "v", _ => 1L).collect()
    }
    assert(nullG.getMessage.contains("null"))
  }

  test("TopK aggregator matches row_number semantics incl. duplicate entries") {
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    // duplicates on purpose: identical (v, id) rows must BOTH rank, like
    // row_number — plus ties on v broken by id
    val rows = (0 until 2000).map { i =>
      (s"g${i % 5}", rnd.nextInt(50).toLong, rnd.nextInt(300).toLong)
    }
    val topk = org.apache.spark.sql.functions.udaf(new graft.functions.TopK(4),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong))
    val got = rows.toDF("g", "v", "id")
      .groupBy(col("g")).agg(topk(col("v"), col("id")).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("p", "e")))
      .select(col("g"), col("p"), col("e._1").as("v"), col("e._2").as("id"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    val want = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      rs.map(t => (t._2, t._3)).sortBy(t => (-t._1, t._2)).take(4)
        .zipWithIndex.map { case ((v, id), p) => (g, p, v, id) }
    }.sortBy(t => (t._1, t._2))
    assert(got === want)
  }

  test("q75 exact median matches a driver-side sort on the real table") {
    val d = "/root/testdata/sf0.001"
    val got = RelationalQueries.registry("q75_exact_median")
      .build(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val cents = graft.sources.Tables.lineitem(spark, d)
      .select(col("l_returnflag"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val want = cents.groupBy(_._1).map { case (g, rs) =>
      val sorted = rs.map(_._2).sorted
      g -> sorted(((sorted.length + 1) / 2 - 1).toInt)
    }
    assert(got === want)
  }
}
