package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Dev profiler (guide §1: measure first): runs the named queries after
  * the Bench warmups and prints, per WARM run, the job/stage breakdown —
  * job wall-clock, per-stage task time, shuffle bytes and record counts.
  * Shows where a multi-job iterative query actually spends its time
  * (scheduler latency vs shuffle vs compute). Not part of the driver
  * contract — builder-side measurement tool only.
  * Usage: runMain graft.ProfileQ q_name [q_name ...]
  */
object ProfileQ {
  case class StageRec(id: Int, name: String, tasks: Int,
      taskTimeMs: Long, shufWriteB: Long, shufReadB: Long,
      inRec: Long, outRec: Long)

  class L extends SparkListener {
    val jobStart = mutable.Map.empty[Int, Long]
    val jobEnd = mutable.Map.empty[Int, Long]
    val jobStages = mutable.Map.empty[Int, Seq[Int]]
    val jobDesc = mutable.Map.empty[Int, String]
    val stages = mutable.Map.empty[Int, StageRec]
    override def onJobStart(e: SparkListenerJobStart): Unit = {
      jobStart(e.jobId) = e.time
      jobStages(e.jobId) = e.stageIds
      jobDesc(e.jobId) = Option(e.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = jobEnd(e.jobId) = e.time
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      val si = e.stageInfo
      val m = si.taskMetrics
      stages(si.stageId) = StageRec(si.stageId, si.name.takeWhile(_ != '\n'),
        si.numTasks, m.executorRunTime,
        m.shuffleWriteMetrics.bytesWritten, m.shuffleReadMetrics.totalBytesRead,
        m.inputMetrics.recordsRead, m.outputMetrics.recordsWritten)
    }
    def reset(): Unit = { jobStart.clear(); jobEnd.clear(); jobStages.clear(); stages.clear() }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = Harness.sfDir()
    val spark = Harness.session()
    val l = new L
    spark.sparkContext.addSparkListener(l)
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    Bench.warmups(spark, sfDir).foreach { case (_, body) =>
      try body() catch { case _: Throwable => () }
    }
    args.foreach { q =>
      val fn = SparkEntry.queries(q)
      fn(spark, sfDir).count() // untimed warm run
      Thread.sleep(200)
      l.reset()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener events drain
      println(f"%n===== $q warm: $wall%.3f s, rows=$n =====")
      val jobs = l.jobStart.keys.toSeq.sorted
      var covered = 0L
      jobs.foreach { j =>
        val dur = (l.jobEnd.getOrElse(j, l.jobStart(j)) - l.jobStart(j)) / 1e3
        covered += (dur * 1000).toLong
        println(f"  job $j%3d ${dur}%7.3f s  ${l.jobDesc.getOrElse(j, "")}")
        l.jobStages.getOrElse(j, Nil).sorted.foreach { sid =>
          l.stages.get(sid).foreach { st =>
            println(f"    stage ${st.id}%4d tasks=${st.tasks}%3d taskTime=${st.taskTimeMs}%6d ms " +
              f"sw=${st.shufWriteB / 1024}%7d KB sr=${st.shufReadB / 1024}%7d KB " +
              f"in=${st.inRec}%9d out=${st.outRec}%7d  ${st.name}")
          }
        }
      }
      println(f"  jobs=${jobs.size} jobWallSum=${covered / 1e3}%.3f s (gaps = driver/planning time)")
    }
    spark.stop()
  }
}
