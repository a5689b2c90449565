package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Relational, Tables}

class RelationalSpec extends AnyFunSuite {
  import TestSpark._

  test("entry smoke: flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs and every oracle key has a query") {
    val qs = SparkEntry.queries
    assert(qs.size >= 59, s"expected >=59 queries, got ${qs.size}")
    SparkEntry.oracleSql.keys.foreach(k => assert(qs.contains(k), s"oracle without query: $k"))
  }

  test("top-k is a prefix of the full sort") {
    val full = Tables.lineitem(spark, sf0001)
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .select("l_orderkey", "l_linenumber").limit(10).collect().toSeq
    val topk = Relational.q_topk_global(spark, sf0001)
      .select("l_orderkey", "l_linenumber").collect().toSeq
    assert(topk == full)
  }

  test("union-all counts add; intersect is a subset of both inputs") {
    val c = Tables.customer(spark, sf0001).count()
    val s2 = Tables.supplier(spark, sf0001).count()
    val ua = Relational.q_set_union_all(spark, sf0001)
      .agg(sum("n")).collect()(0).getLong(0)
    assert(ua == c + s2)
    val inter = Relational.q_set_intersect(spark, sf0001).collect().map(_.getInt(0)).toSet
    val custNations = Tables.customer(spark, sf0001)
      .select("c_nationkey").distinct().collect().map(_.getInt(0)).toSet
    assert(inter.subsetOf(custNations))
  }

  test("approx_count_distinct within 5% of exact") {
    val exact = Relational.q_agg_count_distinct(spark, sf001)
      .select("event_type", "n_users").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Relational.approxDistinctRaw(spark, sf001)
      .select("event_type", "approx_users").collect()
      .foreach { r =>
        val e = exact(r.getString(0)).toDouble
        assert(math.abs(r.getLong(1) - e) / e <= 0.05,
          s"${r.getString(0)}: approx=${r.getLong(1)} exact=$e")
      }
    // and the registered bracket contract itself holds on the fixture
    Relational.q_agg_approx_distinct(spark, sf001)
      .select("event_type", "within_3rsd").collect()
      .foreach(r => assert(r.getBoolean(1), s"${r.getString(0)}: outside 3rsd"))
  }

  test("decimal money sum is permutation-invariant") {
    val li = Tables.lineitem(spark, sf0001)
    val a = li.agg(graft.engine.Dsl.moneySum(col("l_extendedprice"))).collect()(0).getDouble(0)
    val b = li.orderBy(rand(7)).agg(graft.engine.Dsl.moneySum(col("l_extendedprice")))
      .collect()(0).getDouble(0)
    assert(a == b)
  }
}
