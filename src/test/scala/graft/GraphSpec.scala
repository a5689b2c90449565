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

  test("pagerank invariants: positive ranks, mass ~= vertex count, top-20 stable") {
    val s = spark
    val top = GraphOps.q_graph_pagerank(s, sf0001).collect()
    assert(top.length == 20)
    assert(top.forall(_.getDouble(1) > 0.0))
    // rank mass: staticPageRank preserves sum(rank) == n vertices (±5%)
    val er = GraphOps.edges(s, sf0001).rdd
      .map(r => Edge(2L * r.getLong(0), 2L * r.getLong(1) + 1L, 1.0))
    val g = Graph.fromEdges(er, 0.0)
    val n = g.numVertices.toDouble
    val mass = g.staticPageRank(10, 0.15).vertices.map(_._2).sum()
    assert(math.abs(mass - n) / n < 0.05, s"rank mass $mass vs $n vertices")
    // deterministic across runs
    val top2 = GraphOps.q_graph_pagerank(s, sf0001).collect()
    assert(top.toSeq.map(r => (r.getLong(0), r.getDouble(1))) ==
      top2.toSeq.map(r => (r.getLong(0), r.getDouble(1))))
  }

  test("degree sum equals edge count (bipartite handshake)") {
    val s = spark
    val degSum = GraphOps.q_graph_degree(s, sf0001)
      .agg(sum("degree")).collect()(0).getLong(0)
    assert(degSum == GraphOps.edges(s, sf0001).count())
  }
}
