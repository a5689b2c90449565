package graft

/** Dev tool: sweep every registered query's pre-AQE physical plan and
  * print the scale-hazard nodes (CartesianProduct, BroadcastNestedLoopJoin,
  * unpartitioned WindowExec) per query — the scouting pass behind the
  * full-surface plan gate in PlanAuditSpec. Usage:
  *   runMain graft.PlanSweep [sfDir]
  */
object PlanSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Harness.session(defaultCpus = "4")
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, sfDir).queryExecution.sparkPlan
        val cart = p.collect {
          case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
        }
        val bnlj = p.collect {
          case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
        }
        val unboundedBnlj = bnlj.filterNot { j =>
          val side = j.buildSide match {
            case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
            case _ => j.right
          }
          side.find {
            case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec =>
              a.groupingExpressions.isEmpty
            case _: org.apache.spark.sql.execution.LocalTableScanExec => true
            case _ => false
          }.isDefined
        }
        unboundedBnlj.foreach { j =>
          val side = j.buildSide match {
            case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
            case _ => j.right
          }
          val nodes = side.collect { case n => n.nodeName }.take(8).mkString(">")
          println(s"[sweep] $name UNBOUNDED_BNLJ side=$nodes")
        }
        val gwin = p.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty => w
        }
        val glim = p.collect {
          case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec
            if w.partitionSpec.isEmpty => w
        }
        if (cart.nonEmpty || bnlj.nonEmpty || gwin.nonEmpty || glim.nonEmpty)
          println(s"[sweep] $name cart=${cart.size} bnlj=${bnlj.size} " +
            s"gwin=${gwin.size} glim=${glim.size}")
      } catch {
        case e: Throwable => println(s"[sweep] $name BUILD_FAIL ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
