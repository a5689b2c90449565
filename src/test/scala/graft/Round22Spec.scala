package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.LlmOps

/** Round-16 (driver round) pins: the vector tier's capacity is a
  * deterministic FUNCTION of corpus size (VERDICT r15 item 1 — fixed
  * nlist=16 / LshBits=8 made semdedup O(n²/16) and the ANN cell scans
  * O(n/16)), shared with the oracle CTEs which recompute the same
  * rules from the data (GREATEST(16, FLOOR(SQRT(n))) /
  * length(bin(n-1))-4 clamped). These pins hold the Scala side of the
  * contract; the DuckDB side is hash-certified by the correctness
  * gate at every sf. */
class Round22Spec extends AnyFunSuite {
  import TestSpark._

  test("lshBits: clamp(ceil(log2 n) - 4, 8, 16) via exact integer bit length") {
    assert(LlmOps.lshBits(1L) == 8, "degenerate corpus floors at 8 bits")
    assert(LlmOps.lshBits(500L) == 8, "sf0.001/0.01 fixture stays at the floor")
    assert(LlmOps.lshBits(2000L) == 8, "sf0.1 fixture stays at the floor")
    assert(LlmOps.lshBits(4096L) == 8, "2^12 vectors: ceil=12, 12-4=8")
    assert(LlmOps.lshBits(4097L) == 9, "first corpus size past the floor")
    assert(LlmOps.lshBits(1L << 20) == 16, "2^20 vectors reach the ceiling")
    assert(LlmOps.lshBits((1L << 20) + 1) == 16,
      "the 16-bit ceiling is the explicit fence past n = 2^20")
    // expected bucket occupancy stays ~[8, 16] in the adaptive range:
    // n / 2^bits for n = 2^k, k in (12, 20] is 2^(k - (k-4)) = 16
    (13 to 20).foreach { k =>
      val n = 1L << k
      val occ = n.toDouble / (1L << LlmOps.lshBits(n))
      assert(occ <= 16.0 + 1e-9 && occ >= 8.0 - 1e-9,
        s"expected occupancy at n=2^$k should sit in [8,16], got $occ")
    }
  }

  test("ivfNlist: max(16, floor(sqrt(n))) from the memoized corpus probe") {
    // 500-vector fixture: isqrt(500) = 22 (sf0.001 and sf0.01 share it)
    assert(LlmOps.ivfNlist(spark, sf0001) == 22L)
    assert(LlmOps.embCount(spark, sf0001) == 500L)
  }

  test("semdedup runs one cell per centroid and every cid is in range") {
    val cells = SparkEntry.queries("q_llm_semdedup")(spark, sf0001).collect()
    assert(cells.length == 22,
      s"every centroid self-assigns, so all 22 cells are non-empty: ${cells.length}")
    assert(cells.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 22),
      "cell ids are the nlist smallest vec_ids")
  }

  test("louvain hierarchy: boundary invariance and level-1/2 agreement " +
      "across the three implementations (VERDICT r15 item 5)") {
    val ladder = SparkEntry.queries("q_graph_louvain_hierarchy")(spark, sf0001)
      .orderBy("level").collect()
    assert(ladder.nonEmpty && ladder.length <= graft.engine.GraphOps.LouvainMaxLevels)
    // modularity is invariant under coarsening: level k+1's BEFORE
    // score equals level k's AFTER score exactly, at every boundary —
    // the identity that proves each sweep ran on the true coarse graph
    ladder.sliding(2).foreach {
      case Array(prev, next) =>
        assert(next.getLong(4) == prev.getLong(5),
          s"q4m2_before(level ${next.getLong(0)}) != q4m2_after(level ${prev.getLong(0)})")
      case _ => ()
    }
    // the ladder's first row IS q_graph_louvain_move's pricing (the
    // generic weighted stats with w=1, sw=0 ≡ the unweighted sweep)
    val mv = SparkEntry.queries("q_graph_louvain_move")(spark, sf0001).collect()(0)
    assert(ladder(0).getLong(1) == mv.getLong(0) // n_super_nodes == n_nodes
      && ladder(0).getLong(2) == mv.getLong(2)   // n_moved
      && ladder(0).getLong(3) == mv.getLong(3)   // n_communities
      && ladder(0).getLong(4) == mv.getLong(4)   // q4m2_before
      && ladder(0).getLong(5) == mv.getLong(5),  // q4m2_after
      s"ladder row 1 ${ladder(0)} != louvain_move $mv")
    // the second row equals q_graph_louvain_level2 — which runs the
    // DISTRIBUTED weighted sweep, while the fixture ladder's tail runs
    // through the gate-checked IN-MEMORY path: this is the cross-path
    // bit-equality pin for the bounded-tail device
    if (ladder.length > 1) {
      val l2 = SparkEntry.queries("q_graph_louvain_level2")(spark, sf0001).collect()(0)
      assert(ladder(1).getLong(1) == l2.getLong(0)
        && ladder(1).getLong(2) == l2.getLong(2)
        && ladder(1).getLong(3) == l2.getLong(3)
        && ladder(1).getLong(4) == l2.getLong(4)
        && ladder(1).getLong(5) == l2.getLong(5),
        s"ladder row 2 ${ladder(1)} != louvain_level2 $l2")
    }
    // convergence semantics: every non-final level both moved nodes
    // and changed the score; the final level is either converged
    // (n_moved = 0 or score fixed point) or the level bound
    ladder.init.foreach { r =>
      assert(r.getLong(2) > 0 && r.getLong(4) != r.getLong(5),
        s"non-final level ${r.getLong(0)} should not be converged: $r")
    }
    val last = ladder.last
    assert(last.getLong(2) == 0 || last.getLong(4) == last.getLong(5)
      || last.getLong(0) == graft.engine.GraphOps.LouvainMaxLevels.toLong,
      s"final level must be converged or at the bound: $last")
  }
}
