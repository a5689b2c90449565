package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.GraphOps

/** Whole-graph structure metrics (round 8): range/consistency invariants
  * the oracle hash-compare would not explain. */
class GraphMetricsSpec extends AnyFunSuite {
  import TestSpark._

  test("modularity is in [-0.5, 1] and communities match label_prop") {
    val r = GraphOps.q_graph_modularity(spark, sf0001).collect()(0)
    val (nComm, m, intra, q) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    assert(q >= -0.5 && q <= 1.0, s"modularity out of range: $q")
    assert(intra >= 0 && intra <= m)
    val lpComm = GraphOps.q_graph_label_prop(spark, sf0001).collect()
      .map(_.getLong(1)).sum
    assert(nComm == lpComm, s"community count $nComm != label_prop total $lpComm")
  }

  test("assortativity is in [-1, 1] with arcs = 2 * edges") {
    val r = GraphOps.q_graph_assortativity(spark, sf0001).collect()(0)
    val (m, arcs, a) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(arcs == 2 * m)
    assert(a >= -1.0 && a <= 1.0, s"assortativity out of range: $a")
  }
}
