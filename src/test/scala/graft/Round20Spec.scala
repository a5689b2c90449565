package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Gnn, GraphOps, SourceOps, Tables, TrainOps}

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

  test("louvain first sweep equals a driver-side integer replay") {
    val pp = GraphOps.partPairs(spark, sf0001, GraphOps.TriangleMinCooccur)
      .select(col("a"), col("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val und = pp ++ pp.map(_.swap)
    val adj = und.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val deg = adj.view.mapValues(_.length.toLong).toMap
    val m = pp.length.toLong
    val lbl = deg.map { case (a, k) =>
      val (kj, j) = adj(a).map(b => (deg(b), b)).min
      a -> (if (2 * m > k * kj) j else a)
    }
    val nMoved = lbl.count { case (a, l) => l != a }.toLong
    val intra = pp.count { case (a, b) => lbl(a) == lbl(b) }.toLong
    val dcs = lbl.toSeq.groupBy(_._2)
      .map { case (_, ns) => ns.map(n => deg(n._1)).sum }
    val q4After = 4 * m * intra - dcs.map(d => d * d).sum
    val q4Before = -deg.values.map(k => k * k).sum
    val r = GraphOps.q_graph_louvain_move(spark, sf0001).collect()(0)
    assert(r.getLong(0) == deg.size.toLong && r.getLong(1) == m, "node/edge counts")
    assert(r.getLong(2) == nMoved && r.getLong(3) == dcs.size.toLong,
      s"moves/communities: got (${r.getLong(2)},${r.getLong(3)}) want ($nMoved,${dcs.size})")
    assert(r.getLong(4) == q4Before && r.getLong(5) == q4After, "exact Q*4m^2 scores")
    assert(r.getLong(5) > r.getLong(4), "the first sweep must improve Q on the fixture")
    assert(nMoved > 0, "non-vacuous: some node moves at sf0.001")
  }

  test("acid diff classes equal the key-residue replay") {
    val keys = Tables.orders(spark, sf0001)
      .select(col("o_orderkey")).collect().map(_.getLong(0))
    val expect = Map(
      "insert" -> keys.count(_ % 3 == 1).toLong,
      "update" -> keys.count(_ % 9 == 0).toLong,
      "unchanged" -> keys.count(k => k % 3 == 0 && k % 9 != 0).toLong)
    val got = SourceOps.q_src_acid_diff(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expect, s"diff classes: $got vs $expect")
  }
}
