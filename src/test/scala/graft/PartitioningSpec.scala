package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Dsl, Tables}

/** The two remaining 100 TB shuffle techniques, proven at the plan level:
  * bucketing (co-located joins with NO exchange) and key salting (skewed
  * aggregation split into two phases with identical results). */
class PartitioningSpec extends AnyFunSuite {
  import TestSpark._

  test("bucketed tables join with no shuffle exchange on either side") {
    val s = spark
    val prevBroadcast = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = s.conf.get("spark.sql.adaptive.enabled")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      Tables.lineitem(s, sf0001)
        .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
      Tables.orders(s, sf0001)
        .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("o_bucketed")
      val j = s.table("li_bucketed")
        .join(s.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      // same answer as the unbucketed join
      val plain = Tables.lineitem(s, sf0001)
        .join(Tables.orders(s, sf0001), col("l_orderkey") === col("o_orderkey"))
      assert(j.count() == plain.count())
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      s.conf.set("spark.sql.adaptive.enabled", prevAqe)
      s.sql("DROP TABLE IF EXISTS li_bucketed")
      s.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("range-partitioned sort is globally ordered with NO single-partition sort") {
    val s = spark
    // the 100 TB global-sort pattern: repartitionByRange samples split
    // points, each partition sorts locally, partition order == key order —
    // a full ORDER BY materialization with no one-node bottleneck
    val sorted = Tables.customer(s, sf0001)
      .repartitionByRange(8, col("c_acctbal").desc, col("c_custkey").asc)
      .sortWithinPartitions(col("c_acctbal").desc, col("c_custkey").asc)
    val plan = sorted.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), s"range exchange expected:\n$plan")
    assert(!plan.toLowerCase.contains("singlepartition"),
      "global sort must not collapse to one partition")
    // partitions concatenated in index order yield the exact global order
    val collected = sorted.select(col("c_acctbal"), col("c_custkey")).collect()
      .map(r => (r.getDouble(0), r.getLong(1)))
    val expected = Tables.customer(s, sf0001)
      .select(col("c_acctbal"), col("c_custkey")).collect()
      .map(r => (r.getDouble(0), r.getLong(1)))
      .sortBy { case (bal, key) => (-bal, key) }
    assert(collected.toSeq == expected.toSeq,
      "partition-index concatenation must equal the global ORDER BY")
    assert(sorted.rdd.getNumPartitions > 1, "work must spread over partitions")
  }

  test("salted two-phase aggregation equals direct aggregation on skewed keys") {
    val s = spark
    val li = Tables.lineitem(s, sf0001) // l_returnflag: 3 heavily-skewed keys
    val direct = li.groupBy(col("l_returnflag"))
      .agg(Dsl.moneySum(col("l_extendedprice")).as("total"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag").collect().toSeq
    // phase 1: aggregate per (key, salt) — spreads each hot key over 16
    // reducers; phase 2: merge the partials per key. Decimal sums make
    // the result independent of the split.
    val salted = li
      .withColumn("salt", pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(16)))
      .groupBy(col("l_returnflag"), col("salt"))
      .agg(sum(Dsl.dec(col("l_extendedprice"))).as("part_sum"),
        count(lit(1)).as("part_n"))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("part_sum")).cast("double").as("total"),
        sum(col("part_n")).as("n"))
      .orderBy("l_returnflag").collect().toSeq
    assert(salted == direct)
  }
}
