package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Builder-side scale-up probe (NOT part of the driver contract): builds
  * a 4× replica of the sf0.1 fixture in /tmp by unioning key-shifted
  * copies (same dimensions, 4× the facts — the realistic growth axis:
  * more orders/docs/events over the same catalog), then times a
  * representative query per operator family at 1× and 4×. The ratio is
  * the measured scaling exponent evidence behind PERF.md's 100 TB
  * design claims: linear-scan families should land near 4×, the
  * pair-explosion families near their documented super-linear cost.
  * Fixture tables under /root/testdata are read-only inputs; the
  * replica lives in /tmp and is a PERF experiment, not an oracle input.
  */
object ScaleProbe {
  val Base = "/root/testdata/sf0.1"
  val Out = "/tmp/graft_scale/sf0.4"
  val Copies = 4

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def table(dir: String, name: String): DataFrame =
      spark.read.parquet(s"$dir/$name.parquet")

    def replicate(name: String, shifts: Map[String, Long]): Unit = {
      val base = table(Base, name)
      val copies = (0 until Copies).map { k =>
        shifts.foldLeft(base) { case (df, (c, span)) =>
          df.withColumn(c, col(c) + lit(k * span))
        }
      }
      copies.reduce(_.union(_)).write.mode("overwrite")
        .parquet(s"$Out/$name.parquet")
    }

    if (!new java.io.File(s"$Out/lineitem.parquet").exists || args.contains("rebuild")) {
      // key spans chosen >> max key so shifted copies never collide
      val oSpan = 100000000L
      val dSpan = 10000000L
      replicate("lineitem", Map("l_orderkey" -> oSpan))
      replicate("orders", Map("o_orderkey" -> oSpan))
      replicate("events", Map("event_id" -> dSpan))
      replicate("documents", Map("doc_id" -> dSpan))
      replicate("embeddings", Map("vec_id" -> dSpan))
      // dimensions unchanged: same catalog, 4× the facts
      Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
        table(Base, t).write.mode("overwrite").parquet(s"$Out/$t.parquet")
      }
      System.err.println(s"[scale] replica built at $Out")
    }

    val probes = Seq(
      "q_agg_pricing_summary",  // fact scan + partial/final agg
      "q_join_star_5way",       // broadcast-dim star join
      "q_llm_dedup_exact",      // hash-groupBy dedup
      "q_llm_minhash_md5",      // banded MinHash LSH (the 100 TB dedup path)
      "q_text_token_count",     // text scan + per-lang agg
      "q_llm_cosine_topk",      // embedding scan + top-k
      "q_graph_degree",         // fact-join edge build + keyed count
      "q_win_topk_per_group")   // keyed rank window over the fact table
    def time(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    // untimed warm pass at BOTH scales: session/codegen init AND the
    // session MVs (edges etc.) build once per (session, dir) — timing a
    // warm 1× against a cold 4× would misattribute the one-time build
    probes.foreach { q => time(q, Base); time(q, Out) }
    println(f"${"query"}%-26s ${"sf0.1"}%8s ${"sf0.4"}%8s ${"ratio"}%7s")
    probes.foreach { q =>
      val a = math.min(time(q, Base), time(q, Base))
      val b = math.min(time(q, Out), time(q, Out))
      println(f"$q%-26s $a%8.2f $b%8.2f ${b / a}%7.2f")
    }
    spark.stop()
  }
}
