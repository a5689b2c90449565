package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Gnn, GraphOps, StreamingGnn}

/** Bipartite edge event for the two-hop streaming scenario. */
case class L2Edge(src: Long, dst: Long, embedding: Seq[Float])

/** Round-7 operators: streaming 2-layer GNN (chained keyed-state stages),
  * GNN SGD training step, HDRF streaming edge partitioning. Cross-engine
  * values are pinned by the DuckDB oracle gate; these tests pin semantics
  * a hash-compare would not explain.
  */
class Round7Spec extends AnyFunSuite {
  import TestSpark._

  test("stream 2-layer GNN over fixture matches batch q_gnn_layer2 math") {
    val stream = StreamingGnn.q_stream_gnn_layer2(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), (2 to 5).map(r.getDouble)))).toMap
    val batch = Gnn.q_gnn_layer2(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (1 to 4).map(r.getDouble)).toMap
    assert(stream.keySet == batch.keySet)
    // n_custs = per-part degree of the co-purchase graph
    val deg = GraphOps.edges(spark, sf0001).collect()
      .groupBy(_.getLong(1)).map { case (k, rs) => k -> rs.length.toLong }
    stream.foreach { case (part, (n, gs)) =>
      assert(n == deg(part), s"part $part: n_custs $n vs degree ${deg(part)}")
      gs.zip(batch(part)).foreach { case (a, b) =>
        // both sides round to 6dp; aggregation order may differ by 1 ulp
        // which can flip the last rounded digit
        assert(math.abs(a - b) <= 2e-6, s"part $part: stream $gs vs batch ${batch(part)}")
      }
    }
  }

  test("stream 2-layer GNN: chained two-hop streaming pipeline converges to batch") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    def v(xs: Float*): Seq[Float] = xs ++ Seq.fill(64 - xs.length)(0.0f)
    // bipartite graph: cust 1 -> parts {10, 11}, cust 2 -> part {10}
    // edge event = (cust, part-embedding); arrives over two micro-batches
    val b1 = Seq(L2Edge(1, 10, v(1f, 2f)), L2Edge(2, 10, v(10f, 0f)))
    val b2 = Seq(L2Edge(1, 11, v(3f, 4f)))
    // ---- hop 1: customer representation maintainer ----
    val ms1 = MemoryStream[L2Edge]
    val q1 = StreamingGnn.custRepStream(s, ms1.toDF())
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("l1out").start()
    ms1.addData(b1: _*); q1.processAllAvailable()
    ms1.addData(b2: _*); q1.processAllAvailable(); q1.stop()
    // latest layer-1 snapshot per customer (the stream hop 2 subscribes to)
    val latest = s.table("l1out").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .foldLeft(Map.empty[Long, Array[Double]])((m, kv) => m + kv) // last wins
    // ---- hop 2: part aggregation keyed by part (Flink iteration edge) ----
    val edges = (b1 ++ b2).map(e => e.src -> e.dst)
    val msgs = edges.map { case (c, p) => StreamingGnn.PartMsg(p, c, latest(c)) }
    val ms2 = MemoryStream[StreamingGnn.PartMsg]
    val q2 = StreamingGnn.partRepStream(s, ms2.toDS())
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("l2out").start()
    ms2.addData(msgs: _*); q2.processAllAvailable(); q2.stop()
    val got = s.table("l2out").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    // ground truth: batch 2-layer math on the same tiny graph
    val h1 = Map(
      1L -> Gnn.forward(Array.tabulate(64)(i => if (i == 0) 2.0 else if (i == 1) 3.0 else 0.0)),
      2L -> Gnn.forward(Array.tabulate(64)(i => if (i == 0) 10.0 else 0.0)))
    def l2(custs: Seq[Long]): Double = {
      val mean = Array.tabulate(64)(i => custs.map(c => h1(c)(i)).sum / custs.length)
      Gnn.forward(mean)(0)
    }
    assert(got(10L)._1 == 2L && got(11L)._1 == 1L)
    assert(math.abs(got(10L)._2 - l2(Seq(1L, 2L))) < 1e-9)
    assert(math.abs(got(11L)._2 - l2(Seq(1L))) < 1e-9)
  }
}
