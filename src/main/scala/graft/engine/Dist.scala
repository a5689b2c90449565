package graft.engine

import graft.engine.Ckpt.CkptOps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global-order devices — the replacement for the
  * single-partition `Window.orderBy(...)` anti-pattern on any input
  * that grows with the data (VERDICT r12 items 1-2; the device was
  * first proven inline in q_gnn_link_pred_auc, TrainOps.scala).
  *
  * Shape: range-partition the input on the total order (equal keys land
  * in ONE partition; ascending partition ids hold ascending key
  * ranges), compute row_number / running-sum WITHIN each partition via
  * a pid-partitioned window (parallel), collect only the per-partition
  * (count, sum) totals — ≤ numShufflePartitions rows, bounded by
  * cluster config, not data — exclusive-prefix-scan them on the driver
  * and broadcast the offsets back. Exact, order-blind, and every stage
  * scales with executors. The localCheckpoint pins spark_partition_id
  * so both consumers (offset aggregation + main pass) see one
  * materialized partitioning instead of re-sampling range bounds.
  */
object Dist {

  /** Global `row_number()` over `order` as column `rnkCol` (BIGINT,
    * 1-based) and — when `value` = Some((valueCol, cumName)) — the
    * inclusive running SUM of the BIGINT `valueCol` as `cumName`,
    * both under the same total order, with NO single-partition window.
    * Returns (augmented df, row count n, grand total of valueCol).
    * `order` must be a total order (tie-break to a unique key) so the
    * rank is deterministic. */
  def orderedPrefix(df: DataFrame, order: Seq[Column], rnkCol: String,
      value: Option[(Column, String)] = None): (DataFrame, Long, Long) = {
    val s = df.sparkSession
    import s.implicits._
    // Loud contract check (ADVICE r13): the prefix-sum math reads the
    // partition sums as BIGINT — an int/decimal/double valueCol would
    // ClassCastException deep in the collect and an all-null partition
    // would NPE; fail at the boundary with the actual type instead.
    value.foreach { case (v, _) =>
      val dt = df.select(v).schema.head.dataType
      require(dt == org.apache.spark.sql.types.LongType,
        s"Dist.orderedPrefix valueCol must be BIGINT (got $dt): cast it first")
    }
    val nParts = s.sessionState.conf.numShufflePartitions
    val parted = df.repartitionByRange(nParts, order: _*)
      .withColumn("_pid", spark_partition_id())
      .ckpt()
    // per-partition totals: ≤ nParts rows — config-bounded driver state
    val per: Array[(Int, Long, Long)] = value match {
      case Some((v, _)) =>
        parted.groupBy(col("_pid"))
          .agg(count(lit(1)).as("c"), coalesce(sum(v), lit(0L)).as("t"))
          .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      case None =>
        parted.groupBy(col("_pid")).agg(count(lit(1)).as("c"))
          .collect().map(r => (r.getInt(0), r.getLong(1), 0L))
    }
    val sorted = per.sortBy(_._1)
    val n = sorted.map(_._2).sum
    val total = sorted.map(_._3).sum
    // exclusive prefix scan → per-partition (rank offset, sum offset)
    val offsets = sorted.scanLeft((-1, 0L, 0L, 0L, 0L)) {
      case ((_, accC, c0, accT, t0), (pid, c, t)) =>
        (pid, accC + c0, c, accT + t0, t)
    }.drop(1).map { case (pid, offC, _, offT, _) => (pid, offC, offT) }.toSeq
    val offDf = broadcast(offsets.toDF("_opid", "_offc", "_offt"))
    val w = Window.partitionBy(col("_pid")).orderBy(order: _*)
    val base = parted.join(offDf, col("_pid") === col("_opid"))
      .withColumn(rnkCol, row_number().over(w).cast("bigint") + col("_offc"))
    val out = value match {
      case Some((v, cumName)) =>
        base.withColumn(cumName,
          sum(v).over(w.rowsBetween(Window.unboundedPreceding, 0))
            + col("_offt"))
      case None => base
    }
    (out.drop("_pid", "_opid", "_offc", "_offt"), n, total)
  }

  /** NTILE(k) over a total order with NO single-partition window —
    * bit-identical to SQL NTILE: with n rows, buckets 1..(n mod k) hold
    * ceil(n/k) rows, the rest floor(n/k); bucket derived from the
    * distributed global rank by closed-form arithmetic (the double
    * division is exact here: counts ≪ 2^53 and integral quotients are
    * exactly representable, so floor() can never land one short). */
  def ntile(df: DataFrame, k: Int, order: Seq[Column], out: String): DataFrame = {
    val (ranked, n, _) = orderedPrefix(df, order, "_dn_rn")
    val q = n / k
    val r = n % k
    val bucket =
      if (q == 0L) col("_dn_rn") // n < k: each row its own bucket
      else when(col("_dn_rn") <= lit(r * (q + 1)),
          floor((col("_dn_rn") + lit(q)).cast("double") / lit((q + 1).toDouble)))
        .otherwise(lit(r) +
          floor((col("_dn_rn") - lit(r * (q + 1)) + lit(q - 1)).cast("double")
            / lit(q.toDouble)))
    ranked.withColumn(out, bucket.cast("bigint")).drop("_dn_rn")
  }
}
