package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class ApproxDistinctSpec extends SparkSpec {
  test("q47: HLL estimate within the configured 2% rsd of the exact count") {
    val d = "/root/testdata/sf0.001"
    val approx = RelationalQueries.registry("q47_approx_distinct")
      .build(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.lineitem(spark, d)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val err = math.abs(approx(k).toDouble - n) / n
      assert(err < 0.06, s"flag $k: approx ${approx(k)} vs exact $n (err $err)")
    }
  }
}
