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
  /** Replica tiers: (copies, dir). 16× exists to show where the
    * scheduling floor gives way to data-bound linear growth. */
  val Tiers = Seq(4 -> "/tmp/graft_scale/sf0.4", 16 -> "/tmp/graft_scale/sf1.6")

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

    def replicate(out: String, copies: Int, name: String,
        shifts: Map[String, Long]): Unit = {
      val base = table(Base, name)
      val reps = (0 until copies).map { k =>
        shifts.foldLeft(base) { case (df, (c, span)) =>
          df.withColumn(c, col(c) + lit(k * span))
        }
      }
      reps.reduce(_.union(_)).write.mode("overwrite")
        .parquet(s"$out/$name.parquet")
    }

    Tiers.foreach { case (copies, out) =>
      if (!new java.io.File(s"$out/lineitem.parquet").exists || args.contains("rebuild")) {
        // key spans chosen >> max key so shifted copies never collide
        val oSpan = 100000000L
        val dSpan = 10000000L
        replicate(out, copies, "lineitem", Map("l_orderkey" -> oSpan))
        replicate(out, copies, "orders", Map("o_orderkey" -> oSpan))
        replicate(out, copies, "events", Map("event_id" -> dSpan))
        replicate(out, copies, "documents", Map("doc_id" -> dSpan))
        replicate(out, copies, "embeddings", Map("vec_id" -> dSpan))
        // dimensions unchanged: same catalog, more facts
        Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
          table(Base, t).write.mode("overwrite").parquet(s"$out/$t.parquet")
        }
        System.err.println(s"[scale] ${copies}x replica built at $out")
      }
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
    // q_llm_minhash_md5 is EXCLUDED from the 16× tier: replicating the
    // corpus 16× manufactures ~256× the true near-dup pairs (every doc
    // gains 15 exact twins), so the 16× number would measure fixture
    // duplication, not engine scaling — the 4× tier already covers it.
    val dirs = Seq(1 -> Base) ++ Tiers
    // untimed warm pass at EVERY scale: session/codegen init AND the
    // session MVs (edges etc.) build once per (session, dir) — timing a
    // warm 1× against a cold replica would misattribute the one-time
    // build
    probes.foreach { q =>
      dirs.foreach { case (c, d) =>
        if (!(q == "q_llm_minhash_md5" && c == 16)) time(q, d)
      }
    }
    println(f"${"query"}%-26s ${"sf0.1"}%8s ${"x4"}%8s ${"x16"}%8s ${"r4"}%6s ${"r16"}%6s")
    probes.foreach { q =>
      def m(dir: String): Double = math.min(time(q, dir), time(q, dir))
      val a = m(Base)
      val b = m(Tiers(0)._2)
      val c = if (q == "q_llm_minhash_md5") -1.0 else m(Tiers(1)._2)
      val c16 = if (c < 0) "      -" else f"$c%7.2f"
      val r16 = if (c < 0) "     -" else f"${c / a}%6.2f"
      println(f"$q%-26s $a%8.2f $b%8.2f $c16%8s ${b / a}%6.2f $r16%6s")
    }
    spark.stop()
  }
}
