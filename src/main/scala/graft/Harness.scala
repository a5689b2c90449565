package graft

import org.apache.spark.sql.SparkSession

/** Shared session factory for the builder/driver mains (Bench, Verify,
  * TimeQ, TimeOne, ScaleProbe, StreamBench, ApproxBounds, Explain):
  * one place for the contract configuration — local[SPARK_GRAFT_CPUS],
  * shuffle partitions = cores (not the 200 default), UTC, no UI — so
  * the eight entry points cannot drift apart. */
object Harness {
  def session(defaultCpus: String = "32",
      extraConfs: Map[String, String] = Map.empty): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", defaultCpus)
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // The vector tier aggregates 64 dims as 64–129 independent
      // codegen-friendly buffers by design (meanQVec, zscore, the
      // VecMeanAgg display twin); Spark's default 100-field cutoff
      // silently dropped those operators out of whole-stage codegen
      // into interpreted aggregation. 256 re-admits them (r17 opt,
      // measured: neighbor_mean 2.8 -> 0.6 s, udaf_vec_mean 2.0 -> 0.3,
      // embed_zscore 2.1 -> 0.3 at sf0.1/32c). Codegen width is a
      // per-operator property, not a cluster-size tune — the value is
      // the same at any scale.
      .config("spark.sql.codegen.maxFields", "256")
    // Dev A/B knob: extra session confs as "k=v;k=v" (never set by the
    // driver; used to measure config hypotheses without code churn).
    val envConfs = sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(';')).filter(_.contains('='))
      .map { kv => val a = kv.split("=", 2); a(0) -> a(1) }
    val s = (extraConfs.toSeq ++ envConfs).foldLeft(b) {
      case (bb, (k, v)) => bb.config(k, v)
    }.getOrCreate()
    s.sparkContext.setLogLevel(sys.env.getOrElse("SPARK_GRAFT_LOG", "WARN"))
    s
  }

  def sfDir(default: String = "/root/testdata/sf0.1"): String =
    sys.env.getOrElse("SPARK_GRAFT_SF_DIR", default)
}
