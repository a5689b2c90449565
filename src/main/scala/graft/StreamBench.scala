package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.engine.{StreamingGnn, StreamingOps}

/** Builder-side STREAMING throughput bench (not part of the driver
  * contract): events/sec through the engine's three stateful-maintainer
  * shapes on the RocksDB state store — the reference is a streaming
  * system (`/root/reference/README.md:1-2`, Flink + DL4J) that
  * publishes no numbers (BASELINE.md row 1), so this records OUR
  * single-node throughput anchor for the streaming tier, next to the
  * batch anchor in target/bench.json:
  *
  *  1. `embedStream` — the streaming GNN neighbor-mean maintainer
  *     (520 B of keyed state per vertex, the headline capability);
  *  2. `timedSessions` — fMGWS sessionization with event-time timers
  *     and a watermark;
  *  3. `statefulSnapshotTws` — the Spark 4 `transformWithState`
  *     ValueState fold.
  *
  * Input is a deterministic synthetic stream shaped like the sf0.1
  * fixture (600k events; 15k/20k keys), fed through MemoryStream in
  * micro-batches to a noop sink; the measured window is first
  * addData → last processAllAvailable. Run:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.StreamBench"
  *
  * KEY-COUNT axis (VERDICT r9 item 5): `runMain graft.StreamBench keys`
  * re-runs all three shapes at 1×/4×/16× the DISTINCT-KEY count with
  * the event volume held fixed — the state table grows linearly in keys
  * while per-event work must stay flat (each maintainer folds one event
  * into one bounded, order-blind state row; RocksDB gets per-key
  * point lookups). This is the streaming analog of ScaleProbe's
  * graph-replica tiers: at 100 TB the key axis (users/vertices) is the
  * axis that grows, and a super-linear reading here would mean the
  * maintainer secretly rescans its state. Results → PERF.md.
  */
object StreamBench {
  case class Ev2(event_id: Long, user_id: Long, ts: Timestamp, value: Double)

  var Events = 600000
  var Batches = 12
  /** Distinct-key multiplier over the sf0.1-shaped base (15k vertices /
    * 20k users); the `keys` mode sweeps 1/4/16. */
  var KeyMult = 1

  def main(args: Array[String]): Unit = {
    // optional: <events> <batches> — throughput is micro-batch-floor
    // bound (~0.5-2 s per batch regardless of size), so larger batches
    // amortize it; run both shapes to see the curve
    val keyAxis = args.contains("keys")
    val numeric = args.filter(_ != "keys")
    if (numeric.length >= 1) Events = numeric(0).toInt
    if (numeric.length >= 2) Batches = numeric(1).toInt
    val spark = Harness.session(extraConfs = Map(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"))
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val perBatch = Events / Batches
    def edgeBatch(b: Int): Seq[StreamingGnn.EdgeFeat] =
      (0 until perBatch).map { i =>
        val g = b.toLong * perBatch + i
        // 15k vertices (sf0.1 customer count) × KeyMult, deterministic
        // 64-dim vec
        StreamingGnn.EdgeFeat(g % (15000L * KeyMult),
          Array.tabulate(64)(j => ((g * 31 + j * 7) % 1000).toFloat / 1000f))
      }
    def evBatch(b: Int): Seq[Ev2] = {
      val users = 20000L * KeyMult
      (0 until perBatch).map { i =>
        val g = b.toLong * perBatch + i
        // 20k users × KeyMult, one event per user per simulated minute:
        // sessions stay OPEN across the whole run (state accumulates)
        Ev2(g, g % users,
          new Timestamp(1704067200000L + (g / users) * 60000L),
          (g % 997).toDouble / 100.0)
      }
    }

    def run[T](name: String, mkBatch: Int => Seq[T],
        start: MemoryStream[T] => org.apache.spark.sql.streaming.StreamingQuery,
        ms: MemoryStream[T]): Unit = {
      // untimed prime batch: state-store + codegen + sink init
      ms.addData(mkBatch(0): _*)
      val q = start(ms)
      q.processAllAvailable()
      val t0 = System.nanoTime()
      (1 until Batches).foreach { b =>
        ms.addData(mkBatch(b): _*)
        q.processAllAvailable()
      }
      val sec = (System.nanoTime() - t0) / 1e9
      val n = (Batches - 1).toLong * perBatch
      q.stop()
      println(f"[streambench] $name%-22s $n%8d events ${sec}%7.2f s " +
        f"${n / sec}%10.0f ev/s  (${Batches - 1} micro-batches, ${sec / (Batches - 1)}%5.2f s/batch)")
    }

    def ckpt(tag: String): String =
      java.nio.file.Files.createTempDirectory(s"graft_sb_$tag").toString

    def runAll(): Unit = {
      val ms1 = MemoryStream[StreamingGnn.EdgeFeat]
      run[StreamingGnn.EdgeFeat](s"gnn_embed(fMGWS)@${KeyMult}x", edgeBatch,
        m => StreamingGnn.embedStream(spark, m.toDF()
            .select(org.apache.spark.sql.functions.col("cust").as("src"),
              org.apache.spark.sql.functions.col("vec").as("embedding")))
          .writeStream.outputMode(OutputMode.Update())
          .option("checkpointLocation", ckpt("embed"))
          .format("noop").start(),
        ms1)

      val ms2 = MemoryStream[Ev2]
      run[Ev2](s"sessions(fMGWS+timer)@${KeyMult}x", evBatch,
        m => StreamingOps.timedSessions(spark, m.toDF())
          .writeStream.outputMode(OutputMode.Append())
          .option("checkpointLocation", ckpt("sess"))
          .format("noop").start(),
        ms2)

      val ms3 = MemoryStream[Ev2]
      run[Ev2](s"snapshot(tws)@${KeyMult}x", evBatch,
        m => StreamingOps.statefulSnapshotTws(spark, m.toDF())
          .writeStream.outputMode(OutputMode.Update())
          .option("checkpointLocation", ckpt("tws"))
          .format("noop").start(),
        ms3)
    }

    val mults = if (keyAxis) Seq(1, 4, 16) else Seq(KeyMult)
    mults.foreach { m =>
      KeyMult = m
      if (keyAxis) println(s"[streambench] == key tier ${m}x: " +
        s"${15000 * m} vertices / ${20000 * m} users, $Events events ==")
      runAll()
    }

    spark.stop()
  }
}
