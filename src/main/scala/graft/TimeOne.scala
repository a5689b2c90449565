package graft

/** Dev utility: time a single SparkEntry query repeatedly.
  * Usage: runMain graft.TimeOne <queryName> [reps]
  * (SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in Bench; untimed warmup
  * first so numbers are comparable to Bench's steady-state entries.)
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val sfDir = Harness.sfDir()
    val spark = Harness.session()
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[timeone] $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
