package graft

import org.apache.spark.sql.functions._

/** Dev probe (round-18 perf note): the isotropy closed form
  * ‖Σû‖² − Σ‖û‖² versus the naive all-pairs join computing the same
  * mean pairwise cosine. Run at two fixture scales to record the
  * quadratic-vs-linear separation that justifies the closed-form
  * design in q_embed_isotropy. Not part of the driver contract. */
object ProbeIso {
  def main(args: Array[String]): Unit = {
    val sfDir = Harness.sfDir()
    val spark = Harness.session()
    val dot = engine.LlmOps.vecDot(spark) _
    val emb = engine.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"),
        sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
      .filter(col("nrm") > 0)
      .localCheckpoint()
    val n = emb.count()

    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[probe-iso] $label%-12s n=$n%6d ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }

    // closed form: the registered operator's shape
    time("closed-form") {
      SparkEntry.queries("q_embed_isotropy")(spark, sfDir).collect()
    }
    // naive: N² pair join, mean of pairwise cosines of the unit vectors
    time("pair-join") {
      val a = emb.select(col("vec_id").as("ia"), col("embedding").as("ea"),
        col("nrm").as("na"))
      val b = emb.select(col("vec_id").as("ib"), col("embedding").as("eb"),
        col("nrm").as("nb"))
      a.join(b, col("ia") =!= col("ib"))
        .select((dot(col("ea"), col("eb")) / (col("na") * col("nb"))).as("cos"))
        .agg(avg(col("cos")))
        .collect()
      ()
    }
    spark.stop()
  }
}
