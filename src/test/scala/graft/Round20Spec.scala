package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Gnn, TrainOps}

/** Round-14 (current cycle) replay pins: operators landed this round
  * re-derived driver-side from first principles on sf0.001. */
class Round20Spec extends AnyFunSuite {
  import TestSpark._

  private def rN(v: Double, n: Int): Double =
    BigDecimal(v).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The exact 1e9 quantizer both engines implement: pure IEEE ops. */
  private def q9(x: Double): Long = {
    val y = x * 1e9
    (if (y >= 0) math.floor(y + 0.5) else math.ceil(y - 0.5)).toLong
  }

  private def md5Bid(src: Long, p: Long, k: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"b:$src:$p".getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16) % k
  }

  test("mini-batch SGD equals a driver-side quantized replay; batches differ from full-batch") {
    val feat = Gnn.linkPredFeatures(spark, sf0001)
      .select(col("src"), col("p"), col("y"), col("f1"), col("f2"), col("f3"), col("f4"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        Array(r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))))
    val byBid = feat.groupBy { case (src, p, _, _) =>
      md5Bid(src, p, TrainOps.MiniBatches) }
    assert(byBid.size == TrainOps.MiniBatches && byBid.values.forall(_.nonEmpty),
      "md5 split must populate every batch")

    var w = Array.tabulate(4)(j => Gnn.sgdW(j + 1))
    val expect = (for {
      ep <- 1 to TrainOps.MiniEpochs
      b <- 0 until TrainOps.MiniBatches
    } yield {
      val ex = byBid(b.toLong)
      var lossSum = 0L
      val g = Array.fill(4)(0L)
      ex.foreach { case (_, _, y, f) =>
        val score = (2 to 4).foldLeft(w(0) * f(0))((acc, j) => acc + w(j - 1) * f(j - 1))
        val sig = 1.0 / (1.0 + math.exp(-score))
        val resid = rN(sig - y, 9)
        lossSum += q9(-(y * math.log(sig) + (1.0 - y) * math.log(1.0 - sig)))
        (0 until 4).foreach(j => g(j) += q9(resid * f(j)))
      }
      val n = ex.length.toDouble
      val meanLoss = rN(lossSum.toDouble / 1e9 / n, 6)
      w = Array.tabulate(4)(j => w(j) - Gnn.SgdEta * (g(j).toDouble / 1e9 / n))
      ((ep - 1) * TrainOps.MiniBatches + b + 1, meanLoss, w.map(rN(_, 6)).toSeq)
    }).toSeq

    val got = TrainOps.q_gnn_sgd_minibatch(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getDouble(1),
        (2 to 5).map(r.getDouble).toSeq)).toSeq
    assert(got == expect, s"mini-batch replay mismatch:\n got=$got\n exp=$expect")

    // fidelity: the per-batch weight carry must NOT reduce to the
    // full-batch epoch's trajectory (same step count comparison)
    val full = TrainOps.q_gnn_sgd_epoch(spark, sf0001).collect()
      .map(r => (2 to 5).map(r.getDouble).toSeq)
    assert(got.map(_._3).take(full.length) != full.toSeq,
      "mini-batch trajectory must differ from full-batch")
  }
}
