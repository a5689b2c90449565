package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{BpeOps, ClusterOps, Gnn, GraphOps, Relational, SketchOps, StreamingOps, Tables}

/** Invariant tests for the round-6 operators. Cross-engine values are
  * pinned by the DuckDB oracle gate; these pin the semantics a
  * hash-compare would not explain (partition/conservation laws,
  * sketch one-sidedness, walk validity, determinism under re-run).
  */
class Round6Spec extends AnyFunSuite {
  import TestSpark._

  test("kmeans: clusters partition the table; inertia finite and non-negative") {
    val rows = ClusterOps.q_llm_kmeans(spark, sf0001).collect()
    val total = Tables.embeddings(spark, sf0001).count()
    assert(rows.map(_.getLong(1)).sum == total,
      "cluster sizes must partition the embedding table")
    assert(rows.length <= ClusterOps.KmeansK)
    assert(rows.forall(_.getDouble(2) >= 0.0))
    // deterministic: a re-run (fresh plan) reproduces byte-equal output
    val again = ClusterOps.q_llm_kmeans(spark, sf0001).collect()
    assert(rows.toSeq == again.toSeq)
  }

  test("pca: engine matches the driver-side algorithm replica; Rayleigh bounds hold") {
    val rows = ClusterOps.q_embed_pca(spark, sf0001).collect()
    assert(rows.length == 1)
    val lam = rows(0).getDouble(0)
    val v = (1 to ClusterOps.PcaDims).map(rows(0).getDouble).toArray
    assert(lam > 0, "leading eigenvalue of a covariance matrix is positive")
    assert(math.abs(v.map(math.abs).max - 1.0) < 1e-6, "L-inf normalized direction")
    // ground truth: sample covariance + 100 power iterations in Scala
    val x = Tables.embeddings(spark, sf0001)
      .select((1 to ClusterOps.PcaDims).map(j =>
        element_at(col("embedding"), j).cast("double")): _*)
      .collect().map(r => Array.tabulate(ClusterOps.PcaDims)(r.getDouble))
    val d = ClusterOps.PcaDims; val n = x.length
    val m = Array.tabulate(d)(j => x.map(_(j)).sum / n)
    val c = Array.tabulate(d, d)((j, k) =>
      x.map(r => (r(j) - m(j)) * (r(k) - m(k))).sum / (n - 1))
    // replicate the SAME 6-iteration L∞ power iteration driver-side: the
    // corpus spectrum is near-degenerate (random-ish embeddings), so a
    // converged eigenvector is NOT a sound reference — the algorithm
    // replica is
    var t = Array.tabulate(d)(j => if (j == 0) 1.0 else 0.0)
    for (_ <- 1 to ClusterOps.PcaIters) {
      val w = Array.tabulate(d)(j => (0 until d).map(k => c(j)(k) * t(k)).sum)
      val nrm = w.map(math.abs).max
      t = w.map(_ / nrm)
    }
    v.zip(t).zipWithIndex.foreach { case ((a, b), j) =>
      assert(math.abs(a - b) < 1e-4, s"loading l${j + 1}: engine $a vs replica $b")
    }
    // Rayleigh quotient is monotone under power iteration and bounded by
    // the spectrum: c_11 = RQ(v0) <= lambda <= trace(C)
    val trace = (0 until d).map(j => c(j)(j)).sum
    assert(lam >= c(0)(0) - 1e-9 && lam <= trace + 1e-9,
      s"eigenvalue $lam outside [c11=${c(0)(0)}, trace=$trace]")
  }

  test("random walks: every hop is a projection edge; walks are reproducible") {
    val pp = GraphOps.partPairs(spark, sf0001, GraphOps.TriangleMinCooccur)
      .select(col("a"), col("b")).collect().map(r => (r.getLong(0), r.getLong(1)))
    val und = (pp ++ pp.map(_.swap)).toSet
    val walks = Gnn.q_gnn_rand_walk(spark, sf0001).collect()
    assert(walks.nonEmpty)
    walks.foreach { r =>
      val path = (0 to Gnn.WalkSteps).map(r.getLong)
      path.sliding(2).foreach { case Seq(u, v) =>
        assert(und.contains((u, v)), s"hop $u->$v not an edge (walk ${path.mkString("->")})")
      }
      val nd = r.getLong(Gnn.WalkSteps + 1)
      assert(nd == path.distinct.size && nd <= Gnn.WalkSteps + 1)
    }
    val again = Gnn.q_gnn_rand_walk(spark, sf0001).collect()
    assert(walks.toSeq == again.toSeq)
  }

  test("personalized pagerank: scores in (0,1]; seed part ranks first") {
    val rows = GraphOps.q_graph_ppr(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.forall(r => r.getDouble(1) > 0 && r.getDouble(1) <= 1.0))
    // the seed (smallest part id in the graph) receives the only teleport
    // mass, so with 0.15 restart it must dominate every other part
    val seedPart = GraphOps.edges(spark, sf0001)
      .agg(min(col("dst"))).collect()(0).getLong(0)
    assert(rows(0).getLong(0) == seedPart,
      s"seed $seedPart must rank first, got ${rows(0)}")
  }

  test("count-min sketch never undercounts; estimates are consistent") {
    val rows = SketchOps.q_llm_cms_topk(spark, sf0001).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val (exact, est, over) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(est >= exact, s"CMS undercounted ${r.getString(0)}: $est < $exact")
      assert(over == est - exact)
    }
  }

  test("shard assignment: shards partition the corpus with sane balance") {
    val rows = SketchOps.q_llm_shard_assign(spark, sf0001).collect()
    val nDocs = Tables.documents(spark, sf0001).count()
    assert(rows.map(_.getLong(1)).sum == nDocs)
    assert(rows.length <= SketchOps.NumShards)
    // md5 spreads uniformly: no shard should be pathologically off-target
    rows.foreach(r => assert(r.getDouble(5) > 0.3 && r.getDouble(5) < 3.0,
      s"shard ${r.getLong(0)} balance ${r.getDouble(5)} out of range"))
  }

  test("time spine: consecutive days, zero-filled, conserves event count") {
    val rows = Relational.q_time_spine(spark, sf0001).collect()
    val days = rows.map(_.getDate(0).toLocalDate)
    days.sliding(2).foreach { case Array(a, b) =>
      assert(b == a.plusDays(1), s"spine gap between $a and $b")
    }
    val nEvents = Tables.events(spark, sf0001).count()
    assert(rows.map(_.getLong(1)).sum == nEvents)
    assert(rows.exists(_.getLong(1) == 0L) || days.length == rows.count(_.getLong(1) > 0),
      "spine must surface zero days explicitly when gaps exist")
  }

  test("bpe training: symbol count shrinks by the applied merges each round") {
    val rows = BpeOps.q_llm_bpe_train(spark, sf0001).collect()
    assert(rows.length == BpeOps.BpeRounds)
    // each round removes one symbol per VALID merge: at least one, at
    // most pair_count (overlapping self-pair runs merge only odd ranks)
    val nChars = Tables.documents(spark, sf0001)
      .filter(col("lang") === "en" && col("doc_id") % 10 === 0)
      .agg(sum(length(substring(col("text"), 1, BpeOps.BpePrefix))))
      .collect()(0).getLong(0)
    var prev = nChars
    rows.foreach { r =>
      val n = r.getLong(4)
      assert(n < prev && prev - n <= r.getLong(3),
        s"step ${r.getInt(0)}: $prev -> $n outside (0, pair_count=${r.getLong(3)}]")
      prev = n
    }
    // pair counts are non-increasing: a later top pair can never beat an
    // earlier round's maximum
    rows.sliding(2).foreach { case Array(x, y) =>
      assert(y.getLong(3) <= x.getLong(3))
    }
  }

  test("bpe greedy merge: overlapping self-pair runs keep odd-rank matches") {
    val s = spark
    import s.implicits._
    // one doc 'aaabab': pairs (a,a)=2, (a,b)=2, (b,a)=1 — the c-tie breaks
    // lexicographically to (a,a), merged greedily: aaabab -> [aa,a,b,a,b]
    val docs = Seq((0L, "aaabab", "en", "src0", 6L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = BpeOps.q_llm_bpe_train(s, dir).collect()
    assert(out(0).getString(1) == "a" && out(0).getString(2) == "a",
      s"round-1 pair must be the lexicographic tie-winner (a,a): ${out(0)}")
    assert(out(0).getLong(3) == 2L, "greedy count includes the overlap pair")
    assert(out(0).getLong(4) == 5L, "aaabab merges to [aa,a,b,a,b] = 5 symbols")
  }

  test("bpe apply: trained merges shrink (or keep) the eval corpus monotonically") {
    val rows = BpeOps.q_llm_bpe_apply(spark, sf0001).collect()
    assert(rows.length == BpeOps.BpeRounds)
    // the merge table must be identical to the one training reports
    val trained = BpeOps.q_llm_bpe_train(spark, sf0001).collect()
    assert(rows.map(r => (r.getString(1), r.getString(2))).toSeq ==
      trained.map(r => (r.getString(1), r.getString(2))).toSeq,
      "apply must use the trained merge table in training order")
    val evalChars = Tables.documents(spark, sf0001)
      .filter(col("lang") === "en" && col("doc_id") % 10 === 1)
      .agg(sum(length(substring(col("text"), 1, BpeOps.BpePrefix))))
      .collect()(0).getLong(0)
    var prev = evalChars
    rows.foreach { r =>
      val n = r.getLong(3)
      assert(n <= prev, "eval symbol count can never grow under a merge")
      prev = n
    }
  }

  test("kneser-ney: p(.|a) sums to 1 over the continuation vocabulary") {
    // rebuild the count tables driver-side from the train split and check
    // the defining property of interpolated KN: for any seen context a,
    // Σ_b [max(c(ab)-D,0)/c(a·) + D·N1+(a·)/c(a·)·N1+(·b)/N1+(··)] = 1
    val s = spark
    val bigrams = Tables.documents(s, sf0001)
      .filter(col("doc_id") % 10 =!= 0)
      .select(col("lang"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("lang"), explode(expr(
        "transform(sequence(1, size(toks) - 1)," +
          " i -> struct(element_at(toks, i) as a, element_at(toks, i + 1) as b))")).as("p"))
      .select(col("lang"), col("p.a"), col("p.b"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val lang = bigrams.head._1
    val bc = bigrams.filter(_._1 == lang).groupBy(p => (p._2, p._3)).view.mapValues(_.length).toMap
    val ca = bc.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val n1a = bc.groupBy(_._1._1).view.mapValues(_.size).toMap
    val n1b = bc.groupBy(_._1._2).view.mapValues(_.size).toMap
    val n1pp = bc.size.toDouble
    val d = graft.engine.TextOps.KnD
    val vocabB = n1b.keys.toSeq
    ca.keys.take(20).foreach { a =>
      val sum = vocabB.map { b =>
        math.max(bc.getOrElse((a, b), 0) - d, 0.0) / ca(a) +
          d * n1a(a) / ca(a) * (n1b(b) / n1pp)
      }.sum
      assert(math.abs(sum - 1.0) < 1e-9, s"KN mass for context '$a' = $sum")
    }
    // and the engine output is sane
    val rows = graft.engine.TextOps.q_text_kneser_ney(s, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(3) && r.getLong(2) >= r.getLong(4),
        "backoff/floor counts bounded by bigram count")
      assert(r.getDouble(5) > 0, "cross-entropy positive")
    }
  }

  test("scd2 history: versions chain without overlap; one current row per user") {
    val rows = StreamingOps.q_stream_scd2(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_.getLong(0))
    byUser.foreach { case (u, vs) =>
      assert(vs.count(_.getBoolean(5)) == 1, s"user $u must have exactly one current row")
      val sorted = vs.sortBy(_.getTimestamp(3).getTime)
      sorted.sliding(2).foreach { case Array(a, b) =>
        assert(a.getTimestamp(4) == b.getTimestamp(3),
          s"user $u: valid_to of one version must open the next")
        assert(a.getString(2) != b.getString(2),
          s"user $u: consecutive versions must differ in type")
      }
    }
  }

  test("approx percentiles sit within 2% of the exact sort-based values") {
    val apx = Relational.approxPercentileRaw(spark, sf001).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = Tables.orders(spark, sf001)
      .groupBy(col("o_orderstatus"))
      .agg(percentile(col("o_totalprice"), lit(0.5)).as("p50"),
        percentile(col("o_totalprice"), lit(0.9)).as("p90"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(apx.keySet == exact.keySet)
    apx.foreach { case (k, (a50, a90)) =>
      val (e50, e90) = exact(k)
      assert(math.abs(a50 - e50) / e50 < 0.02, s"$k p50: $a50 vs $e50")
      assert(math.abs(a90 - e90) / e90 < 0.02, s"$k p90: $a90 vs $e90")
    }
    // and the registered rank-band bracket holds on the fixture
    Relational.q_agg_approx_percentile(spark, sf001)
      .select("o_orderstatus", "p50_in_band", "p90_in_band").collect()
      .foreach { r =>
        assert(r.getBoolean(1) && r.getBoolean(2),
          s"${r.getString(0)}: GK estimate outside the rank band")
      }
  }

  test("rejection sampling: acceptance tracks p_keep; skewed langs downsampled") {
    val rows = graft.engine.PipelineOps.q_llm_rejection_sample(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, kept, p, acc) = (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
      assert(kept <= n && acc <= 1.0)
      // md5-uniform LLN: acceptance within ±0.15 of the target p at n≥100
      if (n >= 100) assert(math.abs(acc - p) < 0.15, s"${r.getString(0)}: acc $acc vs p $p")
    }
  }

  test("unpivot melts the pivot back to the long-form group-by") {
    val long = Relational.q_unpivot_stack(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    val direct = Tables.orders(spark, sf0001)
      .groupBy(year(col("o_orderdate")).cast("int").as("yr"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(long == direct)
  }
}
