package graft

import org.apache.spark.sql.DataFrame
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

  /** GRAPH tiers (VERDICT r8 item 3): every fact AND dimension key is
    * shifted, so each copy is a DISJOINT replica of the co-purchase
    * graph — |V| and |E| both scale by the copy count, per-customer
    * basket sizes (and so pair density, fixpoint round counts, and
    * component diameters) stay exactly the base graph's. That is the
    * horizontal-scaling axis the iterative/fixpoint tier must be
    * measured on; the fact tiers above leave customers unshifted, which
    * scales basket DENSITY (a different, super-linear axis pairCounts
    * documents). */
  val GraphTiers = Seq(4 -> "/tmp/graft_scale/g4", 16 -> "/tmp/graft_scale/g16")

  /** PERTURBED-DOCUMENT tiers (VERDICT r8 item 9): copy k > 0 appends
    * the copy index to EVERY whitespace token, so for any two docs A, B
    * within a copy J(A_k, B_k) = J(A, B) exactly (one uniform bijection
    * on the token universe), while cross-copy token sets are fully
    * disjoint. The 16× corpus therefore has 16× the docs at the BASE
    * near-dup rate — unlike naive replication, which hands every doc 15
    * exact twins and makes a 16× LSH probe measure fixture duplication
    * (the reason q_llm_minhash_md5 was excluded from the fact-tier 16×,
    * PERF.md). */
  val PerturbTiers = Seq(4 -> "/tmp/graft_scale/p4", 16 -> "/tmp/graft_scale/p16")

  def main(args: Array[String]): Unit = {
    // fail fast on a typo'd group name BEFORE the (long) replica builds
    val known = Set("fact", "iter", "lsh", "r16", "r16iter", "r18", "r19", "r19g", "r20", "r20g", "r21g", "emb")
    val asked = args.filter(_ != "rebuild").toSet
    val unknown = asked -- known
    require(unknown.isEmpty,
      s"unknown probe group(s) ${unknown.mkString(", ")} — valid: ${known.mkString(", ")} (plus 'rebuild')")
    val spark = Harness.session()

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

    // key spans chosen >> max key so shifted copies never collide; all
    // are multiples of 10 so deterministic `% 10` samples keep their rate
    val oSpan = 100000000L
    val dSpan = 10000000L
    Tiers.foreach { case (copies, out) =>
      if (!new java.io.File(s"$out/lineitem.parquet").exists || args.contains("rebuild")) {
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
    GraphTiers.foreach { case (copies, out) =>
      if (!new java.io.File(s"$out/lineitem.parquet").exists || args.contains("rebuild")) {
        // disjoint graph copies: shift the customer and part key spaces
        // along with the order keys, and replicate those dimensions with
        // the same shifts so every dimension join still resolves
        replicate(out, copies, "lineitem",
          Map("l_orderkey" -> oSpan, "l_partkey" -> dSpan))
        replicate(out, copies, "orders",
          Map("o_orderkey" -> oSpan, "o_custkey" -> dSpan))
        replicate(out, copies, "customer", Map("c_custkey" -> dSpan))
        replicate(out, copies, "part", Map("p_partkey" -> dSpan))
        Seq("region", "nation", "supplier", "events", "documents",
          "embeddings").foreach { t =>
          table(Base, t).write.mode("overwrite").parquet(s"$out/$t.parquet")
        }
        System.err.println(s"[scale] ${copies}x GRAPH replica built at $out")
      }
    }
    PerturbTiers.foreach { case (copies, out) =>
      if (!new java.io.File(s"$out/documents.parquet").exists || args.contains("rebuild")) {
        val base = table(Base, "documents")
        val reps = (0 until copies).map { k =>
          val shifted = base.withColumn("doc_id", col("doc_id") + lit(k * dSpan))
          // copy 0 keeps the original text; copy k suffixes every token
          // with ·k — a uniform bijection per copy, so intra-copy
          // Jaccard structure is preserved EXACTLY and cross-copy
          // overlap is zero. The middle-dot separator is outside the
          // fixture's token alphabet; a bare digit suffix is NOT
          // collision-free for k ≥ 10 ("x"+"11" == "x1"+"1", so copies
          // 1 and 11 would share tokens — round-9 code-review catch)
          if (k == 0) shifted
          else shifted.withColumn("text",
            regexp_replace(col("text"), "(\\S+)", "$1·" + k.toString))
        }
        reps.reduce(_.union(_)).write.mode("overwrite")
          .parquet(s"$out/documents.parquet")
        Seq("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "embeddings").foreach { t =>
          table(Base, t).write.mode("overwrite").parquet(s"$out/$t.parquet")
        }
        System.err.println(s"[scale] ${copies}x PERTURBED-DOC replica built at $out")
      }
    }

    def time(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    /** Warm pass at every scale (session/codegen init plus the one-time
      * session-MV builds per dir), then min-of-2 timed samples. The warm
      * pass's FIRST call per (query, dir) is also reported as `cold`:
      * for MV-consuming queries it includes the one-time fixpoint/build
      * cost at that scale (attributed to the group's first consumer —
      * shared MVs make later queries' cold times partly warm). */
    def runGroup(title: String, probes: Seq[String], tiers: Seq[(Int, String)],
        exclude: Set[(String, Int)] = Set.empty): Unit = {
      val dirs = Seq(1 -> Base) ++ tiers
      val cold = scala.collection.mutable.Map.empty[(String, Int), Double]
      probes.foreach { q =>
        dirs.foreach { case (c, d) =>
          if (!exclude((q, c))) cold((q, c)) = time(q, d)
        }
      }
      // Columns and exclusion keys all derive from `tiers` (ADVICE r9:
      // the old body hard-coded exclude((q, 16)) and tiers(0)/tiers(1),
      // so editing a tier list silently misaligned the printed columns).
      println(s"== $title ==")
      val timedHdr = tiers.map { case (n, _) => f"${s"x$n"}%8s" }.mkString(" ")
      val ratioHdr = tiers.map { case (n, _) => f"${s"r$n"}%6s" }.mkString(" ")
      val coldHdr = dirs.map { case (n, _) => f"${s"c$n"}%7s" }.mkString(" ")
      println(f"${"query"}%-26s ${"sf0.1"}%8s $timedHdr $ratioHdr $coldHdr")
      probes.foreach { q =>
        def m(dir: String): Double = math.min(time(q, dir), time(q, dir))
        val a = m(Base)
        val ts = tiers.map { case (n, d) =>
          n -> (if (exclude((q, n))) -1.0 else m(d))
        }
        val timedCols = ts.map { case (_, v) =>
          if (v < 0) f"${"-"}%8s" else f"$v%8.2f" }.mkString(" ")
        val ratioCols = ts.map { case (_, v) =>
          if (v < 0) f"${"-"}%6s" else f"${v / a}%6.2f" }.mkString(" ")
        val coldCols = dirs.map { case (n, _) =>
          cold.get((q, n)).map(v => f"$v%7.2f").getOrElse(f"${"-"}%7s") }.mkString(" ")
        println(f"$q%-26s $a%8.2f $timedCols $ratioCols $coldCols")
      }
    }

    val groups = if (asked.nonEmpty) asked else known
    if (groups("fact")) {
      // q_llm_minhash_md5 stays EXCLUDED from the FACT-tier 16×: naive
      // replication manufactures ~256× the true near-dup pairs (every
      // doc gains 15 exact twins) — its realistic 16× curve is the
      // `lsh` group below on the perturbed corpus.
      runGroup("fact tiers (density axis)", Seq(
        "q_agg_pricing_summary",  // fact scan + partial/final agg
        "q_join_star_5way",       // broadcast-dim star join
        "q_llm_dedup_exact",      // hash-groupBy dedup
        "q_llm_minhash_md5",      // banded MinHash LSH (the 100 TB dedup path)
        "q_text_token_count",     // text scan + per-lang agg
        "q_llm_cosine_topk",      // embedding scan + top-k
        "q_graph_degree",         // fact-join edge build + keyed count
        "q_win_topk_per_group"),  // keyed rank window over the fact table
        Tiers, Set("q_llm_minhash_md5" -> 16))
    }
    if (groups("iter")) {
      // the iterative/fixpoint tier on DISJOINT graph copies: per-round
      // cost should scale ~linearly with |E| while round counts stay
      // flat (component structure is copy-invariant)
      runGroup("graph tiers (iterative/fixpoint, horizontal axis)", Seq(
        "q_graph_cc",             // min-label + pointer jumping fixpoint
        "q_graph_label_prop",     // synchronous label propagation
        "q_graph_hits",           // hub/authority power iteration
        "q_graph_ppr",            // personalized-pagerank push
        "q_graph_betweenness",    // k-source BFS accumulation
        "q_graph_pagerank"),      // global power iteration
        GraphTiers)
    }
    if (groups("r16")) {
      // round-16 additions on the fact (density) axis: the calendar-
      // bounded stats (kendall/markov assembly) should grow with the
      // event scan but keep their day²-bounded tails flat; heaps/cohort
      // are linear scans + keyed aggs; basket_lift consumes the
      // pairCounts MV whose density axis is documented super-linear.
      runGroup("round-16 tiers (fact/density axis)", Seq(
        "q_time_markov",          // lead window + k²-bounded assembly
        "q_time_kendall_tau",     // daily pair join (calendar-bounded)
        "q_agg_cohort_retention", // keyed min + distinct month join
        "q_text_heaps_law",       // token aggs + 10-row threshold join
        "q_embed_outliers",       // 64-moment agg + broadcast + top-k
        "q_agg_basket_lift"),     // pairCounts consumer (density axis)
        Tiers)
    }
    if (groups("r16iter")) {
      // round-16 centralities on DISJOINT graph copies (horizontal
      // axis): per-step cost ~|E|, step counts copy-invariant
      runGroup("round-16 tiers (centralities, horizontal axis)", Seq(
        "q_graph_katz",
        "q_graph_eigenvector",
        "q_graph_harmonic"),
        GraphTiers)
    }
    if (groups("r18")) {
      // round-18 additions on the fact (density) axis: the streaming
      // maintainers' state is key-bounded (20 B/customer RFM, 528 B
      // per isotropy shard, 64 B/lang minhash), so cost should track
      // the linear scan; the sweep-line and the DP/rank stats are
      // day-bounded after their daily aggs and should stay near-flat
      // past the scan growth.
      runGroup("round-18 tiers (streaming maintainers + sweeps)", Seq(
        "q_stream_rfm",           // per-customer (max, count, sum) fold
        "q_stream_isotropy",      // per-shard 64-long vector fold
        "q_stream_minhash",       // per-lang union-sketch min fold
        "q_agg_concurrency",      // sessionize + day-partitioned sweep
        "q_time_burst",           // daily agg + bounded integer DP
        "q_time_pettitt"),        // rank windows over day-bounded series
        Tiers)
    }
    if (groups("r19")) {
      // round-19: the Dist prefix-rank consumers on the fact axis (the
      // rank input is the customer dim / vocab — near-constant as facts
      // grow, so cost should track the scan with the device's flat
      // per-job overhead), and the depth-3 GNN + motif joins on
      // DISJOINT graph copies (per-superstep/join cost ~|E|, superstep
      // and pattern counts copy-invariant).
      runGroup("round-19 tiers (Dist consumers, fact axis)", Seq(
        "q_agg_rfm",              // 3x Dist.ntile over the customer agg
        "q_agg_pareto",           // Dist.ntile decile over customer spend
        "q_llm_tokenizer_coverage", // Dist.orderedPrefix vocab ladder
        "q_llm_pipeline_e2e",     // dedup + Dist-packed sequence chain
        "q_src_zorder_layout"),   // Morton key + 2x Dist.ntile file packing
        Tiers)
    }
    if (groups("r19g")) {
      // separate group (own session/run): the per-tier MV caches of a
      // combined run accumulate past local-mode storage memory
      runGroup("round-19 tiers (GNN stack + motifs, horizontal axis)", Seq(
        "q_gnn_layer_k",          // 3 supersteps, quantized boundaries
        "q_graph_motif_find"),    // wedge/triangle joins + degree stars
        GraphTiers)
    }
    if (groups("lsh")) {
      // realistic 16× LSH + dedup clustering: per-copy near-dup rate is
      // exactly the base corpus's (uniform token bijection per copy)
      runGroup("perturbed-doc tiers (realistic near-dup rate)", Seq(
        "q_llm_minhash_md5",      // banded LSH + exact verify
        "q_llm_dedup_clusters"),  // candidate graph + min-label fixpoint
        PerturbTiers)
    }
    if (groups("r20g")) {
      // round-14 Louvain pair on the horizontal graph axis (disjoint
      // replicas: |V|, |E| scale, per-node degrees stay base) — the
      // sweep is one argmin + relabel joins, the coarsening one labeled
      // aggregate: both must track the edge count, not bend above it
      runGroup("round-14 tiers (Louvain sweep + coarsening, horizontal axis)", Seq(
        "q_graph_louvain_move",
        "q_graph_coarsen"),
        GraphTiers)
    }
    if (groups("r21g")) {
      // round-15 Louvain LEVEL 2 on the horizontal graph axis: the only
      // edge-count-scale work is the one relabel join aggregated to
      // (label, label) pair weights; the weighted sweep itself runs on
      // the communities-sized condensed graph, so the curve must track
      // the edge count (the relabel pass), never bend above it
      runGroup("round-15 tier (Louvain level-2 weighted sweep, horizontal axis)", Seq(
        "q_graph_louvain_level2"),
        GraphTiers)
    }
    if (groups("emb")) {
      // round-16 EMBEDDING axis (VERDICT r15 item 1 done-criterion):
      // the fact tiers replicate embeddings with shifted vec_ids, so
      // x4/x16 are real 8k/32k-vector corpora. With the scale-adaptive
      // capacity (nlist = ⌊√n⌋, lshBits = ⌈log₂n⌉−4 clamped) the
      // vector tier's work must grow sub-quadratically: semdedup's
      // within-cell pairs as ~n^1.5 (cells × cell² = √n·n), the IVF/LSH
      // per-query candidate sets as ~√n / ~n·2^−bits.
      runGroup("round-16 tiers (embedding axis, scale-adaptive capacity)", Seq(
        "q_llm_semdedup",         // within-cell pair join, O(n^1.5)
        "q_llm_ann_ivf",          // per-query cell scan, O(√n)
        "q_llm_ann_ivfpq",        // cell-scoped ADC via broadcast LUT
        "q_llm_ann_lsh"),         // 2^bits buckets, ~16 vecs expected
        Tiers)
      // Pair-COUNT evidence (not just wall-clock, which the scheduling
      // floor can mask at these sizes): Σ c·(c−1)/2 over semdedup's own
      // per-cell sizes. Quadratic growth would read ×16 / ×256 at
      // x4 / x16 vectors; the √n rule must hold the ratios near the
      // n^1.5 line (×8 / ×64).
      println("== semdedup within-cell pair counts (embedding axis) ==")
      (Seq(1 -> Base) ++ Tiers).foreach { case (c, d) =>
        val r = SparkEntry.queries("q_llm_semdedup")(spark, d)
          .agg(sum(expr("n_vecs * (n_vecs - 1) / 2")).cast("long").as("pairs"),
            count(lit(1)).as("cells"), sum(col("n_vecs")).as("nv")).collect()(0)
        println(f"x$c%-3d pairs=${r.getLong(0)}%12d cells=${r.getLong(1)}%6d " +
          f"n_vecs=${r.getLong(2)}%8d")
      }
    }
    if (groups("r20")) {
      // round-14 text/bitmap tier (VERDICT r13 item 8): the SAMPLED
      // quadratic ground-truth ops are EXPECTED to bend super-linear on
      // the document axis (pairs grow with the square of the sample —
      // that is exactly why they carry the 20k/lang fence and why the
      // declared scale path is the banded join); q_llm_lsh_clusters is
      // that scale path and must stay near-linear. Recording both
      // curves side by side is the point of the probe.
      runGroup("round-14 tiers (bitmap ground truth vs banded scale path)", Seq(
        "q_llm_lsh_clusters",     // banded candidates + CC — the scale path
        "q_llm_ngram_jaccard",    // fenced sampled-quadratic bitmap tier
        "q_llm_containment"),     // same bitmaps, asymmetric scoring
        PerturbTiers)
    }
    spark.stop()
  }
}
