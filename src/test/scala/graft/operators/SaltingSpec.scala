package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SaltingSpec extends SparkSpec {

  test("salted join returns exactly the plain join's rows on skewed data") {
    import spark.implicits._
    // 90% of probe rows hit one hot key
    val probe = (0 until 1000)
      .map(i => (if (i % 10 == 0) s"k$i" else "hot", i))
      .toDF("key", "v")
    val build = (Seq("hot") ++ (0 until 1000 by 10).map(i => s"k$i"))
      .zipWithIndex.toDF("key", "w")
    val plain = probe.join(build, Seq("key"))
      .select("key", "v", "w").collect().map(_.toSeq).toSet
    val salted = Salting.saltedJoin(probe, build, Seq("key"),
      scatterCols = Seq(col("v")), salt = 8)
      .select("key", "v", "w").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(salted.size == 1000)
  }

  test("deterministic scatter: same input salts identically across runs") {
    import spark.implicits._
    val probe = (0 until 100).map(i => ("hot", i)).toDF("key", "v")
    def salts() = probe
      .withColumn("s", pmod(xxhash64(col("v")), lit(8)))
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(salts() == salts())
  }
}
