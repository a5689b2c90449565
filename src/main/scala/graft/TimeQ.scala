package graft

import org.apache.spark.sql.SparkSession

/** Dev timing harness: `sbt "runMain graft.TimeQ q_a q_b ..."` times the
  * named queries (repeat a name to measure warm runs) on
  * SPARK_GRAFT_SF_DIR after the same untimed session+MV warmup Bench
  * uses, so numbers are comparable to the driver bench's steady state.
  * Not part of the driver contract — a builder-side tool only.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    Bench.warmups(spark, sfDir).foreach { case (_, body) =>
      try body() catch { case _: Throwable => () }
    }
    args.foreach { q =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, sfDir).count()
      println(f"[timeq] $q%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }
    spark.stop()
  }
}
