package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: session, codegen, and parquet-reader initialization
    // otherwise lands entirely on the alphabetically-first query (~5 s of
    // one-time cost misattributed to it).
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // A failed query must NOT contribute a plausible-looking time to the
      // baseline: record a sentinel -1 and flag it on stderr.
      val sec =
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          -1.0
        }
      System.err.println(f"[bench] $name: $sec%.2f s")
      name -> sec
    }.toMap
    def f3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + (if (v < 0) "-1" else f3(v)) }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }.toSeq.sorted
    val total = results.values.filter(_ >= 0).sum
    // Key order matters: the driver keeps only the TAIL of the run output,
    // so the headline fields (metric/value) go LAST — a front-truncated
    // line still shows them, and values are 3dp to keep the line short.
    println(s"""{"queries":$qs,"n_failed":${failed.size},"failed":[${failed.mkString(",")}],"sf":"$sfDir","metric":"total","unit":"sec","value":${f3(total)}}""")
    spark.stop()
  }
}
