package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{GraphOps, LlmOps}

/** Round-17 (driver round) pins: the weighted traversal tier and the
  * multi-probe IVF-PQ curve (VERDICT r16 items 1 + 2). The SSSP query
  * is replayed against an independent in-memory Dijkstra over the same
  * weighted projection (the GraphX-mirror precedent: a different
  * algorithm, not a different engine); the IVF-PQ curve is pinned to
  * its provable set-inclusion identities (re-rank hits dominate ADC
  * hits and grow with nprobe). */
class Round23Spec extends AnyFunSuite {
  import TestSpark._

  test("sssp: bounded Bellman-Ford equals an independent in-memory Dijkstra " +
      "on the sf0.001 weighted projection") {
    val uew = GraphOps.undProjW(spark, sf0001, GraphOps.CcMinCooccur)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(uew.nonEmpty, "fixture projection must be non-empty")
    val adj = uew.groupBy(_._1).map { case (k, es) =>
      k -> es.map(e => (e._2, e._3))
    }
    val seed = uew.map(_._1).min
    // textbook Dijkstra (no round cap — converged ground truth)
    val dist = scala.collection.mutable.Map(seed -> 0L)
    val pq = scala.collection.mutable.PriorityQueue((0L, seed))(
      Ordering.by[(Long, Long), Long](-_._1))
    while (pq.nonEmpty) {
      val (d, u) = pq.dequeue()
      if (d == dist(u)) adj.getOrElse(u, Array.empty[(Long, Long)]).foreach {
        case (v, w) =>
          if (dist.get(v).forall(_ > d + w)) { dist(v) = d + w; pq.enqueue((d + w, v)) }
      }
    }
    val expected = dist.toSeq.map { case (n, d) => (d, n) }.sorted.take(20)
      .map { case (d, n) => (n, d) }
    val got = SparkEntry.queries("q_graph_sssp")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected,
      s"query top-20 $got != Dijkstra top-20 $expected — either the frontier " +
        "loop diverged from full relaxation or SsspMaxRounds is below the " +
        "fixture's convergence depth")
  }

  test("sssp distances are consistent with BFS hops: w ∈ [minCooccur, maxW] " +
      "brackets dist/hops for every co-reported node") {
    val uew = GraphOps.undProjW(spark, sf0001, GraphOps.CcMinCooccur).collect()
    val maxW = uew.map(_.getLong(2)).max
    // recompute hop distances in memory from the same edges
    val edges = uew.map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.groupBy(_._1).map { case (k, es) => k -> es.map(_._2) }
    val seed = edges.map(_._1).min
    val hops = scala.collection.mutable.Map(seed -> 0L)
    var level = 0L
    var front = Set(seed)
    while (front.nonEmpty) {
      level += 1
      front = front.flatMap(u => adj.getOrElse(u, Array.empty[Long]))
        .filterNot(hops.contains)
      front.foreach(v => hops(v) = level)
    }
    SparkEntry.queries("q_graph_sssp")(spark, sf0001).collect().foreach { r =>
      val (n, d) = (r.getLong(0), r.getLong(1))
      // any path has ≥ h edges of weight ≥ minW; the hop-minimal path
      // itself costs ≤ maxW·h — the weighted optimum sits between
      val h = hops(n)
      assert(d >= GraphOps.CcMinCooccur * h && d <= maxW * h,
        s"node $n: weighted dist $d outside [${GraphOps.CcMinCooccur}*$h, $maxW*$h]")
    }
  }

  test("ivfpq nprobe curve: re-rank hits dominate ADC hits and are " +
      "monotone in nprobe (set-inclusion identities)") {
    val rows = SparkEntry.queries("q_llm_ann_ivfpq_nprobe")(spark, sf0001)
      .orderBy("nprobe").collect()
    assert(rows.map(_.getLong(0)).toSeq == LlmOps.NProbes.map(_.toLong),
      "one row per probe width")
    rows.foreach { r =>
      assert(r.getLong(1) == 5L, "all 5 anchor queries present")
      // rerank top-3 contains every exact-top-3 member of the candidate
      // set; ADC top-3 is some other 3-subset of the same candidates —
      // its intersection with the truth can never be larger
      assert(r.getLong(4) >= r.getLong(2),
        s"rerank hits ${r.getLong(4)} < adc hits ${r.getLong(2)} at np=${r.getLong(0)}")
    }
    // candidates grow with nprobe, and an exact-truth member present at
    // np stays present (and selected by the exact re-rank) at np' > np
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getLong(4) >= a.getLong(4),
          s"rerank hits fell from np=${a.getLong(0)} to np=${b.getLong(0)}")
      case _ => ()
    }
  }
}
