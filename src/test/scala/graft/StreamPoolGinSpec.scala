package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{GraphOps, StreamingGnn, TrainOps}

/** Round-8: streaming max-pool aggregator + GIN convolution. */
class StreamPoolGinSpec extends AnyFunSuite {
  import TestSpark._

  test("streaming pool maxima are monotone across micro-batches and match batch") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    def v(xs: Float*): Seq[Float] = xs ++ Seq.fill(64 - xs.length)(0.0f)
    val b1 = Seq(EdgeEvent(1, v(1f, 2f)), EdgeEvent(1, v(-3f, 4f)), EdgeEvent(2, v(10f)))
    val b2 = Seq(EdgeEvent(1, v(5f, -6f)), EdgeEvent(2, v(-20f)))
    val ms = MemoryStream[EdgeEvent]
    val q = StreamingGnn.poolStream(s,
        ms.toDF().withColumnRenamed("src", "src").withColumnRenamed("embedding", "embedding")
          .selectExpr("src", "embedding"))
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("poolst").start()
    ms.addData(b1: _*); q.processAllAvailable()
    val mid = s.table("poolst").collect()
      .groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.maxBy(_.getLong(1)) }
    ms.addData(b2: _*); q.processAllAvailable(); q.stop()
    val fin = s.table("poolst").collect()
      .groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.maxBy(_.getLong(1)) }
    // monotone: the pooled max can only grow as edges arrive
    Seq(1L, 2L).foreach { k =>
      (2 to 5).foreach { i =>
        assert(fin(k).getDouble(i) >= mid(k).getDouble(i) - 1e-12,
          s"cust $k dim ${i - 1} decreased")
      }
    }
    // batch run of the same transform agrees with the final snapshot
    val batch = StreamingGnn.poolStream(s, (b1 ++ b2).toDF("src", "embedding"))
      .collect().map(e => e.custkey -> e).toMap
    Seq(1L, 2L).foreach { k =>
      assert(batch(k).n_neigh == fin(k).getLong(1))
      assert(batch(k).p1 == fin(k).getDouble(2))
      assert(batch(k).p4 == fin(k).getDouble(5))
    }
  }

  test("streaming pool over fixture equals the batch max-pool operator") {
    val stream = StreamingGnn.q_stream_gnn_pool(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), (2 to 5).map(r.getDouble)))).toMap
    val batch = TrainOps.q_gnn_graphsage_pool(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), (2 to 5).map(r.getDouble)))).toMap
    assert(stream.keySet == batch.keySet)
    stream.foreach { case (k, (n, ps)) =>
      assert(n == batch(k)._1, s"cust $k neighbor count")
      // the JVM update fn replays the generated column expression exactly
      assert(ps == batch(k)._2, s"cust $k pooled values differ")
    }
  }

  test("whitening: z has ~zero mean and ~identity covariance") {
    val z = graft.engine.ClusterOps.q_embed_whiten(spark, sf001).collect()
      .map(r => Array(r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    val n = z.length
    val mean = Array.tabulate(4)(j => z.map(_(j)).sum / n)
    mean.foreach(m => assert(math.abs(m) < 1e-6, s"whitened mean not ~0: $m"))
    for (j <- 0 until 4; k <- 0 until 4) {
      val c = z.map(v => (v(j) - mean(j)) * (v(k) - mean(k))).sum / (n - 1)
      val expect = if (j == k) 1.0 else 0.0
      assert(math.abs(c - expect) < 1e-5,
        s"whitened cov($j,$k) = $c, expected $expect")
    }
  }

  test("layer norm: outputs bounded by the max possible z-score") {
    val rows = TrainOps.q_gnn_layer_norm(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // for a sample of 64 values, |x - mean|/std <= sqrt(63)
    val bound = math.sqrt(63.0) + 1e-9
    rows.foreach { r =>
      (1 to 4).foreach { i =>
        val v = r.getDouble(i)
        assert(!v.isNaN && math.abs(v) <= bound, s"layer-norm out of bound: $v")
      }
    }
  }

  test("GIN: sigmoid range, projection node coverage, sum-aggregator sensitivity") {
    val rows = TrainOps.q_gnn_gin(spark, sf0001).collect()
    val nodes = GraphOps.partPairs(spark, sf0001, GraphOps.TriangleMinCooccur)
      .selectExpr("a").union(
        GraphOps.partPairs(spark, sf0001, GraphOps.TriangleMinCooccur).selectExpr("b"))
      .distinct().count()
    assert(rows.length == nodes, "one representation per projection node")
    rows.foreach { r =>
      (1 to 4).foreach { i =>
        val h = r.getDouble(i)
        assert(h > 0.0 && h < 1.0, s"GIN sigmoid out of (0,1): $h")
      }
    }
    // the sum aggregator must NOT be degree-invariant (unlike mean):
    // representations vary across nodes
    assert(rows.map(_.getDouble(1)).distinct.length > 1)
  }
}
