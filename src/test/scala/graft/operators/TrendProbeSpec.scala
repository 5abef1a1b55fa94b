package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q114 per-user OLS trend and q115 join-cost probe: both recomputed
  * driver-side from first principles on the real tables (the oracle
  * checks cross-engine parity; these check the MATH). */
class TrendProbeSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("q114 slope/intercept match a driver-side exact-rational OLS") {
    val rows = graft.sources.Tables.events(spark, d)
      .filter(col("value").isNotNull)
      .select(col("user_id"), unix_timestamp(col("ts")) - lit(1704067200L),
        (col("value").cast("decimal(18,3)") * 1000).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = rows.groupBy(_._1).collect {
      case (u, es) if es.length >= 2 =>
        val n = BigInt(es.length)
        val sx = es.map(e => BigInt(e._2)).sum
        val sy = es.map(e => BigInt(e._3)).sum
        val sxy = es.map(e => BigInt(e._2) * BigInt(e._3)).sum
        val sxx = es.map(e => BigInt(e._2) * BigInt(e._2)).sum
        val den = n * sxx - sx * sx
        val slope = (n * sxy - sx * sy).toDouble / den.toDouble
        (u, (es.length.toLong, slope,
          (sy.toDouble - slope * sx.toDouble) / n.toDouble))
    }.toMap
    val got = RelationalQueries.registry("q114_user_trend").build(spark, d)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (u, (n, s, i)) =>
      val (wn, ws, wi) = want(u)
      assert(n == wn && s == ws && i == wi, s"user $u: ($n,$s,$i) vs ($wn,$ws,$wi)")
    }
    // trends discriminate: not all slopes identical (fixture sanity)
    assert(got.values.map(_._2).toSet.size > 1)
  }

  test("q115 posting statistics match brute force and predict q44's co-occurrence volume") {
    val docs = graft.sources.Tables.documents(spark, d)
    val posting = docs.select(col("doc_id"), col("source"),
        explode(array_distinct(split(col("text"), " "))).as("t"))
      .collect().map(r => (r.getString(1), r.getString(2)))
    val want = posting.groupBy(_._1).map { case (src, ps) =>
      val fs = ps.groupBy(_._2).values.map(_.size.toLong)
      src -> (fs.size.toLong, fs.sum, fs.max,
        fs.map(f => f * (f - 1) / 2).sum, fs.count(_ >= 4096L).toLong)
    }
    val got = CurationQueries.registry("q115_join_cost_probe").build(spark, d)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got == want)
    // pair_rows IS the row count q44's unguarded co-occurrence join
    // emits (id1 < id2, per (source, token)): verify on one source
    val oneSrc = got.keys.min
    val tf = posting.filter(_._1 == oneSrc).groupBy(_._2).values
      .map(_.size.toLong).map(f => f * (f - 1) / 2).sum
    assert(got(oneSrc)._4 == tf)
  }
}
