package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** q108 data audit: every rule must count exactly its planted violations
  * and report zero on clean data — the audit is only trustworthy if both
  * directions are pinned. */
class AuditSpec extends SparkSpec {

  import spark.implicits._

  // minimal clean star schema: 2 customers, 2 orders, 3 lineitems,
  // 1 part, 1 supplier, 2 events
  private def clean: (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) = {
    val customer = Seq((1L, "a"), (2L, "b")).toDF("c_custkey", "c_name")
    val orders = Seq((10L, 1L, 100.0), (11L, 2L, 50.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = Seq(
      (10L, 1, 5.0, 0.05, 7L, 3L), (10L, 2, 10.0, 0.0, 7L, 3L),
      (11L, 1, 50.0, 0.1, 7L, 3L))
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
        "l_partkey", "l_suppkey")
    val part = Seq((7L, "p")).toDF("p_partkey", "p_name")
    val supplier = Seq((3L, "s")).toDF("s_suppkey", "s_name")
    val events = Seq((1L, Option(1.0)), (2L, Option(2.0))).toDF("event_id", "value")
    (lineitem, orders, customer, part, supplier, events)
  }

  private def auditMap(li: DataFrame, o: DataFrame, c: DataFrame,
                       p: DataFrame, s: DataFrame, ev: DataFrame): Map[(String, String), (Long, Long)] =
    AuditQueries.dataAudit(li, o, c, p, s, ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap

  test("clean data: every rule reports zero violations") {
    val (li, o, c, p, s, ev) = clean
    val got = auditMap(li, o, c, p, s, ev)
    assert(got.size == 12, s"expected 12 rules, got ${got.keys.toSeq.sorted}")
    assert(got.values.forall(_._1 == 0L), s"clean data flagged: $got")
    assert(got(("lineitem", "pk_unique"))._2 == 3L)
    assert(got(("orders", "fk_custkey"))._2 == 2L)
  }

  test("planted violations: each rule counts exactly its own") {
    val (li0, o0, c0, p, s, _) = clean
    // two range violations + one duplicate composite PK on lineitem
    val li = li0.unionByName(Seq(
      (10L, 1, 99.0, 0.05, 7L, 3L),  // dup (10,1) AND quantity 99 > 50
      (12L, 1, 5.0, -0.2, 99L, 3L))  // discount < 0 AND orphan l_partkey/l_orderkey
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
        "l_partkey", "l_suppkey"))
    // orphan o_custkey + non-positive total + duplicate o_orderkey
    val o = o0.unionByName(Seq((11L, 42L, -5.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice"))
    // duplicate customer PK
    val c = c0.unionByName(Seq((2L, "b2")).toDF("c_custkey", "c_name"))
    // one null event value
    val ev = Seq((1L, Some(1.0)), (2L, None: Option[Double]))
      .toDF("event_id", "value")
    val got = auditMap(li, o, c, p, s, ev)
    assert(got(("lineitem", "l_quantity_range"))._1 == 1L)
    assert(got(("lineitem", "l_discount_range"))._1 == 1L)
    assert(got(("lineitem", "pk_unique"))._1 == 1L)
    assert(got(("lineitem", "fk_orderkey"))._1 == 1L)   // l_orderkey=12
    assert(got(("lineitem", "fk_partkey"))._1 == 1L)    // l_partkey=99
    assert(got(("lineitem", "fk_suppkey"))._1 == 0L)
    assert(got(("orders", "o_totalprice_positive"))._1 == 1L)
    assert(got(("orders", "pk_unique"))._1 == 1L)
    assert(got(("orders", "fk_custkey"))._1 == 1L)      // o_custkey=42
    assert(got(("customer", "pk_unique"))._1 == 1L)
    assert(got(("events", "value_complete"))._1 == 1L)
    assert(got(("events", "value_nonnegative"))._1 == 0L)
    // a duplicated PARENT key must not multiply child rows in RI counts
    assert(got(("orders", "fk_custkey"))._2 == 3L, "n_rows = child rows, not join rows")
  }

  test("NULL keys: completeness problems, never duplicates or orphans") {
    val (li, o0, c, p, s, ev) = clean
    // two orders with NULL o_orderkey and one with NULL o_custkey: the
    // NULL keys must not count as pk duplicates (r7f review: Spark's
    // count_distinct skips them, DuckDB's row-DISTINCT does not — both
    // sides now audit the non-null domain), and a NULL FK satisfies RI
    val o = o0.unionByName(Seq(
      (Option.empty[Long], Option(3L), 10.0),
      (Option.empty[Long], Option(4L), 20.0),
      (Option(12L), Option.empty[Long], 30.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice"))
    val got = auditMap(li, o, c, p, s, ev)
    assert(got(("orders", "pk_unique"))._1 == 0L,
      "NULL keys are not duplicates of each other")
    // custkeys 3 and 4 ARE orphans (non-null, no parent); NULL is not
    assert(got(("orders", "fk_custkey"))._1 == 2L,
      "NULL FK satisfies referential integrity")
    assert(got(("orders", "fk_custkey"))._2 == 5L)
  }

  test("empty tables audit as zero violations, never NULL") {
    import spark.implicits._
    val (li, o, c, p, s, ev) = clean
    val emptyO = o.filter(lit(false))
    val got = auditMap(li, emptyO, c, p, s, ev)
    // sum() over zero rows is NULL unless coalesced (r7f review): an
    // empty orders table must report 0 for its pk/range/RI rules
    assert(got(("orders", "pk_unique")) == ((0L, 0L)))
    assert(got(("orders", "o_totalprice_positive")) == ((0L, 0L)))
    assert(got(("orders", "fk_custkey")) == ((0L, 0L)))
    // lineitem's RI against the EMPTY parent: every line is an orphan
    assert(got(("lineitem", "fk_orderkey"))._1 == 3L)
  }

  test("registered q108 matches hand-derived rules on the real tables") {
    val d = "/root/testdata/sf0.001"
    val got = AuditQueries.registry("q108_data_audit").build(spark, d)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val li = graft.sources.Tables.lineitem(spark, d)
    val expectedDupLi = li.count() -
      li.select(col("l_orderkey"), col("l_linenumber")).distinct().count()
    assert(got(("lineitem", "pk_unique")) == expectedDupLi)
    val orphan = graft.sources.Tables.lineitem(spark, d)
      .join(graft.sources.Tables.orders(spark, d),
        col("l_orderkey") === col("o_orderkey"), "left_anti").count()
    assert(got(("lineitem", "fk_orderkey")) == orphan)
  }
}
