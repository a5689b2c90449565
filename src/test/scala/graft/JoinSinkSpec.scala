package graft

import java.sql.Timestamp

import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{GraphOps, StreamingOps}

/** Stream-stream joins, the GraphX aggregateMessages mirror, and
  * partitioned sinks with partition pruning — the remaining
  * surface-coverage proofs. */
class JoinSinkSpec extends AnyFunSuite {
  import TestSpark._

  private def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("stream-stream interval join matches clicks within 30 min before purchase") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val pm = MemoryStream[E]
    val cm = MemoryStream[E]
    val q = StreamingOps.purchaseClickJoin(pm.toDF(), cm.toDF())
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ssjoin").start()
    cm.addData(E(10, 1, ts(1, 0), "click", 0), E(11, 1, ts(1, 50), "click", 0),
      E(12, 2, ts(1, 55), "click", 0))
    pm.addData(E(1, 1, ts(2, 0), "purchase", 5.0)) // matches click 11 only (10 is 60 min old)
    q.processAllAvailable(); q.stop()
    val matches = s.table("ssjoin").collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(matches == Set((1L, 11L)), s"got $matches")
  }

  test("left-outer interval join emits the unmatched purchase once the watermark closes it") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val pm = MemoryStream[E]
    val cm = MemoryStream[E]
    // the SHIPPED transform with its outer variant — not a hand-rolled
    // copy that could drift from StreamingOps.purchaseClickJoin
    val j = StreamingOps.purchaseClickJoin(pm.toDF(), cm.toDF(), "left_outer")
    val q = j.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ssleft").start()
    // user 1's purchase has a click in range; user 2's has none
    cm.addData(E(10, 1, ts(1, 50), "click", 0))
    pm.addData(E(1, 1, ts(2, 0), "purchase", 5.0), E(2, 2, ts(2, 0), "purchase", 7.0))
    q.processAllAvailable()
    // advance both watermarks far past the interval so the unmatched row
    // can be finalized as (purchase, null)
    cm.addData(E(90, 9, ts(9, 0), "click", 0))
    pm.addData(E(91, 9, ts(9, 0), "purchase", 0))
    q.processAllAvailable(); q.stop()
    val rows = s.table("ssleft").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(rows(1L) == 10L, s"matched purchase must pair with its click: $rows")
    assert(rows(2L) == -1L,
      s"unmatched purchase must emit with a null click after the watermark: $rows")
  }

  test("full-outer interval join emits unmatched rows from BOTH sides") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val pm = MemoryStream[E]
    val cm = MemoryStream[E]
    val j = StreamingOps.purchaseClickJoin(pm.toDF(), cm.toDF(), "full_outer")
    val q = j.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ssfull").start()
    // user 1: matched pair; user 2: purchase only; user 3: click only
    cm.addData(E(10, 1, ts(1, 50), "click", 0), E(30, 3, ts(1, 55), "click", 0))
    pm.addData(E(1, 1, ts(2, 0), "purchase", 5.0), E(2, 2, ts(2, 0), "purchase", 7.0))
    q.processAllAvailable()
    cm.addData(E(90, 9, ts(9, 0), "click", 0))
    pm.addData(E(91, 9, ts(9, 0), "purchase", 0))
    q.processAllAvailable(); q.stop()
    val rows = s.table("ssfull").collect()
      .map(r => (r.getLong(1),
        (if (r.isNullAt(0)) -1L else r.getLong(0), if (r.isNullAt(3)) -1L else r.getLong(3))))
      .toMap
    assert(rows(1L) == (1L, 10L), s"matched pair: $rows")
    assert(rows(2L) == (2L, -1L), s"purchase-only row must emit with null click: $rows")
    assert(rows(3L) == (-1L, 30L), s"click-only row must emit with null purchase: $rows")
  }

  test("GraphX aggregateMessages neighbor mean equals DataFrame neighbor mean") {
    val s = spark
    val feats = GraphOps.neighborFeatures(s, sf0001) // (src customer, embedding)
    // vertices: customers (2k) and feature-carrying parts edges; messages
    // carry (dim0 value, 1) and average at the customer
    val triplets = feats.collect().map { r =>
      (r.getLong(0), r.getSeq[Float](1).head.toDouble)
    }
    val sc = s.sparkContext
    val edges = sc.parallelize(triplets.zipWithIndex.map { case ((cust, v), i) =>
      Edge(2L * cust, 1000000L + i, v) // synthetic feature-node per edge
    }.toSeq)
    val g = Graph.fromEdges(edges, 0.0)
    val means = g.aggregateMessages[(Double, Long)](
        tc => tc.sendToSrc((tc.attr, 1L)),
        (a, b) => (a._1 + b._1, a._2 + b._2))
      .map { case (vid, (sum, n)) => (vid / 2L, sum / n) }
      .collect().toMap
    val df = GraphOps.q_graph_neighbor_mean(s, sf0001).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(means.keySet == df.keySet)
    means.foreach { case (k, m) =>
      assert(math.abs(m - df(k)) <= 1e-6, s"cust $k: graphx $m vs df ${df(k)}")
    }
  }

  test("partitioned parquet sink prunes partitions on read") {
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("graft_part_sink").toString
    graft.engine.Tables.documents(s, sf0001)
      .write.mode("overwrite").partitionBy("lang").parquet(dir)
    val back = s.read.parquet(dir).filter(col("lang") === "de")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"),
      s"lang filter must prune partitions:\n$plan")
    val expected = graft.engine.Tables.documents(s, sf0001)
      .filter(col("lang") === "de").count()
    assert(back.count() == expected)
  }
}
