package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Relational, Tables}

/** Invariant tests for the round-4 continuation operators. As with
  * Round4Spec, cross-engine values are pinned by the DuckDB oracle gate;
  * these pin the semantics a hash-compare would not explain. */
class Round5Spec extends AnyFunSuite {
  import TestSpark._

  test("histogram: partitions the table exactly, buckets within [0,20)") {
    val rows = Relational.q_agg_histogram(spark, sf0001).collect()
    val nOrders = Tables.orders(spark, sf0001).count()
    assert(rows.map(_.getLong(1)).sum == nOrders,
      "histogram bucket counts must partition the table")
    assert(rows.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 20))
    val totalCents = Tables.orders(spark, sf0001)
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")))
      .collect()(0).getLong(0)
    assert(rows.map(_.getLong(2)).sum == totalCents,
      "per-bucket cent totals must sum to the table total")
    assert(rows.forall(r => r.getDouble(3) <= r.getDouble(4)))
  }

  test("range frame: trailing-30-day totals equal a brute-force recompute") {
    val out = Relational.q_win_range_frame(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(3), r.getLong(4)))
      .toMap
    val orders = Tables.orders(spark, sf0001)
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate"), lit("1992-01-01").cast("date")).as("dayno"),
        col("o_totalprice"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val byCust = orders.groupBy(_._1)
    orders.take(500).foreach { case (ck, ok, dayno, _) =>
      val window = byCust(ck).filter(o => o._3 >= dayno - 30 && o._3 <= dayno)
      val expTotal = window.map(o => BigDecimal(o._4).setScale(2)).sum.toDouble
      val (gotTotal, gotN) = out((ck, ok))
      assert(gotN == window.length, s"frame row count for ($ck,$ok)")
      assert(math.abs(gotTotal - expTotal) < 1e-6, s"frame total for ($ck,$ok)")
    }
  }

  test("bucketed band join equals the naive |Δt| ≤ δ join") {
    val bucketed = Relational.q_join_range_bucket(spark, sf0001).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val ev = Tables.events(spark, sf0001)
    val err = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("e_id"), unix_micros(col("ts")).as("e_us"))
    val naive = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("ts").as("p_ts"),
        unix_micros(col("ts")).as("p_us"))
      .join(err, abs(col("p_us") - col("e_us")) <= 600L * 1000000L)
      .groupBy(to_date(col("p_ts")).as("day"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("p_id")).as("n_purchases"),
        countDistinct(col("e_id")).as("n_errors"))
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(bucketed == naive,
      "bucketing must be result-invisible vs the naive band join")
  }
}
