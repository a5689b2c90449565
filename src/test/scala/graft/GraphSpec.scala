package graft

import org.apache.spark.graphx.{Edge, Graph, PartitionStrategy}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.GraphOps

/** GraphX mirrors cross-checked against the DataFrame implementations
  * (SURVEY.md §5.2.2): same numbers from two independent execution paths.
  */
class GraphSpec extends AnyFunSuite {
  import TestSpark._

  test("GraphX degrees equal DataFrame degrees (bipartite co-purchase)") {
    val s = spark
    val er = GraphOps.edges(s, sf0001).rdd
      .map(r => Edge(2L * r.getLong(0), 2L * r.getLong(1) + 1L, 1))
    val gx = Graph.fromEdges(er, 0).degrees
      .filter { case (vid, _) => vid % 2L == 1L }
      .map { case (vid, d) => ((vid - 1L) / 2L, d.toLong) }
      .collect().toMap
    val df = GraphOps.q_graph_degree(s, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gx == df)
  }

  test("GraphX connected components histogram equals label propagation") {
    val s = spark
    import s.implicits._
    val pp = GraphOps.partPairs(s, sf0001, GraphOps.CcMinCooccur)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val parts = graft.engine.Tables.part(s, sf0001)
      .select("p_partkey").collect().map(_.getLong(0))
    val g = Graph(
      s.sparkContext.parallelize(parts.map(p => (p, 1))),
      s.sparkContext.parallelize(pp.toSeq.map { case (a, b) => Edge(a, b, 1) }))
    val gxHist = g.connectedComponents().vertices
      .map { case (_, comp) => comp }.countByValue()
      .groupBy(_._2).map { case (size, comps) => (size, comps.size.toLong) }
    val dfHist = GraphOps.q_graph_cc(s, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gxHist == dfHist)
  }

  test("GraphX triangle count equals 3-way self-join count") {
    val s = spark
    val pp = GraphOps.partPairs(s, sf0001, GraphOps.TriangleMinCooccur)
      .select("a", "b").rdd.map(r => Edge(r.getLong(0), r.getLong(1), 1))
    val gx = Graph.fromEdges(pp, 0)
      .partitionBy(PartitionStrategy.RandomVertexCut)
      .triangleCount().vertices.map(_._2.toLong).sum() / 3
    val df = GraphOps.q_graph_triangles(s, sf0001).collect()(0).getLong(0)
    assert(gx.toLong == df)
  }

  test("pagerank equals a driver-side power iteration (independent mirror)") {
    val s = spark
    // In-memory reference implementation of the same recurrence:
    // r_{t+1}(v) = 0.15 + 0.85 * Σ_{u∈N(v)} r_t(u)/deg(u), r_0 = 1,
    // over the undirected doubled-id graph — zero shared code with the
    // relational loop under test.
    val es = GraphOps.edges(s, sf0001).collect()
      .map(r => (2L * r.getLong(0), 2L * r.getLong(1) + 1L))
    val und = es ++ es.map { case (a, b) => (b, a) }
    val deg = und.groupBy(_._1).map { case (n, xs) => n -> xs.length }
    var r = deg.map { case (n, _) => n -> 1.0 }
    for (_ <- 1 to 10) {
      val acc = scala.collection.mutable.Map.empty[Long, Double].withDefaultValue(0.0)
      und.foreach { case (u, v) => acc(v) += r(u) / deg(u) }
      r = deg.map { case (n, _) => n -> (0.15 + 0.85 * acc(n)) }
    }
    // undirected graph has no dangling mass: Σr == |V_connected| exactly
    val mass = r.values.sum
    assert(math.abs(mass - deg.size) < 1e-6, s"rank mass $mass vs ${deg.size}")
    val expected = r.toSeq.collect { case (n, rk) if n % 2 == 1 => ((n - 1) / 2, rk) }
      .sortBy { case (pk, rk) => (-rk, pk) }.take(20)
    val top = GraphOps.q_graph_pagerank(s, sf0001).collect()
      .map(row => (row.getLong(0), row.getDouble(1)))
    assert(top.length == 20)
    top.zip(expected).foreach { case ((pk, rk), (epk, erk)) =>
      assert(pk == epk && math.abs(rk - erk) < 1e-5, s"($pk,$rk) vs ($epk,$erk)")
    }
    // deterministic across runs
    val top2 = GraphOps.q_graph_pagerank(s, sf0001).collect()
      .map(row => (row.getLong(0), row.getDouble(1)))
    assert(top.toSeq == top2.toSeq)
  }

  test("cc with no qualifying pairs returns the all-singletons histogram") {
    val s = spark
    import s.implicits._
    // one customer, one part: no pair can reach the co-occurrence
    // threshold, so the label loop must short-circuit (empty-sum branch)
    // and every part must come back as a singleton component
    val dir = java.nio.file.Files.createTempDirectory("graft_cc_empty").toString
    Seq((0L, 0L)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((0L, 0L)).toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq(0L, 1L, 2L).toDF("p_partkey")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val hist = GraphOps.q_graph_cc(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(hist == Seq((1L, 3L)), s"expected 3 singletons, got $hist")
  }

  test("degree sum equals edge count (bipartite handshake)") {
    val s = spark
    val degSum = GraphOps.q_graph_degree(s, sf0001)
      .agg(sum("degree")).collect()(0).getLong(0)
    assert(degSum == GraphOps.edges(s, sf0001).count())
  }
}
