package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Gnn, GraphOps, TrainOps}

/** GNN training-loop operators (TrainOps): semantics the oracle
  * hash-compare would not explain — step-1 equivalence with the single
  * SGD step, optimizer-update bounds, AUC range/accounting, dropout-mask
  * statistics, and pool-aggregator invariants. */
class TrainOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("sgd epoch step 1 reproduces q_gnn_sgd_step exactly") {
    val epoch = TrainOps.q_gnn_sgd_epoch(spark, sf0001).collect()
    assert(epoch.length == TrainOps.EpochSteps)
    val s1 = epoch.find(_.getInt(0) == 1).get
    val single = Gnn.q_gnn_sgd_step(spark, sf0001).collect()(0)
    // single: n_pos, n_neg, mean_loss, w1_new..w4_new; epoch row: step, mean_loss, w1..w4
    assert(s1.getDouble(1) == single.getDouble(2), "mean_loss differs")
    (0 until 4).foreach { j =>
      assert(s1.getDouble(2 + j) == single.getDouble(3 + j), s"w${j + 1} differs")
    }
  }

  test("sgd epoch: loss non-increasing, weights move every step") {
    val rows = TrainOps.q_gnn_sgd_epoch(spark, sf0001).collect().sortBy(_.getInt(0))
    // the 6dp-rounded loss may not visibly move at this scale factor with
    // eta=0.1 and near-zero-mean features; it must never increase.
    rows.map(_.getDouble(1)).sliding(2).foreach { case Array(a, b) =>
      assert(b <= a, s"loss increased: $a -> $b")
    }
    rows.sliding(2).foreach { case Array(a, b) =>
      val wa = (2 to 5).map(a.getDouble)
      val wb = (2 to 5).map(b.getDouble)
      assert(wa != wb, s"weights did not move between steps ${a.getInt(0)} and ${b.getInt(0)}")
    }
  }

  test("adam steps: bounded updates, weights move from init") {
    val rows = TrainOps.q_gnn_adam_step(spark, sf0001).collect().sortBy(_.getInt(0))
    assert(rows.length == TrainOps.AdamSteps)
    var prev = Array.tabulate(4)(j => Gnn.sgdW(j + 1))
    rows.foreach { r =>
      val w = (0 until 4).map(j => r.getDouble(2 + j)).toArray
      (0 until 4).foreach { j =>
        // |Adam update| <= eta * |mhat|/sqrt(vhat) ~= eta (+ rounding slack):
        // with a single gradient the ratio is 1 in step 1 and bounded after.
        assert(math.abs(w(j) - prev(j)) <= Gnn.SgdEta * 1.5 + 1e-6,
          s"step ${r.getInt(0)} w${j + 1} update too large: ${prev(j)} -> ${w(j)}")
      }
      assert(!w.sameElements(prev), "weights did not move")
      prev = w
    }
  }

  test("link-pred AUC is in [0,1] and counts match the example set") {
    val r = TrainOps.q_gnn_link_pred_auc(spark, sf0001).collect()(0)
    val (nPos, nNeg, auc) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(auc >= 0.0 && auc <= 1.0, s"auc out of range: $auc")
    val feat = Gnn.linkPredFeatures(spark, sf0001)
      .select(org.apache.spark.sql.functions.col("y")).collect()
    assert(nPos == feat.count(_.getDouble(0) == 1.0))
    assert(nNeg == feat.count(_.getDouble(0) == 0.0))
  }

  test("dropout forward: mask rate ~30%, outputs non-negative, keys match layer") {
    val drop = TrainOps.q_gnn_dropout_forward(spark, sf0001).collect()
    val layer = Gnn.q_gnn_layer(spark, sf0001).collect()
    assert(drop.map(_.getLong(0)).toSet == layer.map(_.getLong(0)).toSet)
    val totalDropped = drop.map(_.getLong(1)).sum.toDouble
    val rate = totalDropped / (drop.length * Gnn.Dim)
    assert(rate > 0.25 && rate < 0.35, s"dropout rate off: $rate")
    drop.foreach { r =>
      (2 to 5).foreach(i => assert(r.getDouble(i) >= 0.0, "ReLU output negative"))
    }
  }

  test("graphsage pool: sigmoid range, neighbor counts = degrees") {
    val pool = TrainOps.q_gnn_graphsage_pool(spark, sf0001).collect()
    val deg = GraphOps.edges(spark, sf0001).collect()
      .groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.length.toLong }
    assert(pool.length == deg.size)
    pool.foreach { r =>
      assert(r.getLong(1) == deg(r.getLong(0)), "n_neigh != degree")
      (2 to 5).foreach { i =>
        val p = r.getDouble(i)
        assert(p > 0.0 && p < 1.0, s"pooled sigmoid out of (0,1): $p")
      }
    }
  }
}
