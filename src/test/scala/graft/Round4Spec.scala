package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Gnn, Multimodal, PipelineOps, Relational, Tables}

/** Invariant tests for the round-4 operators (SURVEY §2.15). The
  * cross-engine value check is the DuckDB oracle gate; these pin the
  * semantic properties a hash-compare alone would not explain. */
class Round4Spec extends AnyFunSuite {
  import TestSpark._

  test("map_funcs: map reads agree with direct relational aggregation") {
    val m = Relational.q_map_funcs(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getLong(5))).toMap
    val direct = Tables.customer(spark, sf0001)
      .join(Tables.nation(spark, sf0001), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(countDistinct(col("c_mktsegment")).cast("int").as("segs"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(m == direct, "map-based and direct per-nation stats must agree")
  }

  test("win_distribution: percent_rank spans [0,1]; cume_dist ends at 1 per segment") {
    val rows = Relational.q_win_distribution(spark, sf0001).collect()
    assert(rows.forall(r => r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
    val bySeg = rows.groupBy(_.getString(1))
    bySeg.foreach { case (seg, rs) =>
      assert(math.abs(rs.map(_.getDouble(4)).max - 1.0) < 1e-9,
        s"cume_dist must reach 1.0 in segment $seg")
    }
  }

  test("join_lateral: at most 2 rows per customer, each customer's true top-2") {
    val lat = Relational.q_join_lateral(spark, sf0001).collect()
      .groupBy(_.getLong(0)).map { case (c, rs) => c -> rs.map(_.getLong(1)).toSet }
    assert(lat.values.forall(_.size <= 2))
    val win = Tables.orders(spark, sf0001)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .filter(col("rn") <= 2)
      .collect().groupBy(_.getAs[Long]("o_custkey"))
      .map { case (c, rs) => c -> rs.map(_.getAs[Long]("o_orderkey")).toSet }
    assert(lat == win, "lateral top-2 must equal the window top-2")
  }

  test("temporal decay: a customer's aggregate is a convex combination of part features") {
    // weighted mean stays inside [min, max] of the contributing dim-1
    // values — convexity of Σw·x/Σw with w > 0
    val out = Gnn.q_gnn_temporal_decay(spark, sf0001).collect()
    val bounds = Tables.embeddings(spark, sf0001)
      .select(min(element_at(col("embedding"), 1)), max(element_at(col("embedding"), 1)))
      .collect()(0)
    val (lo, hi) = (bounds.getFloat(0).toDouble, bounds.getFloat(1).toDouble)
    assert(out.forall { r =>
      val d1 = r.getDouble(2)
      d1 >= lo - 1e-6 && d1 <= hi + 1e-6
    }, "weighted mean must stay inside the global feature range")
    assert(out.forall(_.getLong(1) > 0), "only customers with positive-weight edges appear")
  }

  test("temporal decay: query output matches a from-scratch recomputation") {
    // Recompute one customer's aggregate directly from the raw tables —
    // pins the datediff direction, the round-9 weight, the w > 0 filter
    // and the weighted-mean formula, not just oracle agreement.
    val out = Gnn.q_gnn_temporal_decay(spark, sf0001).collect()
    val target = out.head // smallest custkey (output is ordered)
    val ck = target.getLong(0)
    val nEmb = Tables.embeddings(spark, sf0001).count()
    val maxD = Tables.orders(spark, sf0001)
      .agg(max(col("o_orderdate"))).collect()(0)
      .getAs[java.time.LocalDateTime](0).toLocalDate
    val emb1 = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), element_at(col("embedding"), 1).cast("double"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val purchases = Tables.orders(spark, sf0001)
      .filter(col("o_custkey") === ck)
      .join(Tables.lineitem(spark, sf0001), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderdate"), col("l_partkey"))
      .collect()
      .map(r => (r.getAs[java.time.LocalDateTime](0).toLocalDate, r.getLong(1)))
    val weighted = purchases.map { case (d, pk) =>
      val age = java.time.temporal.ChronoUnit.DAYS.between(d, maxD)
      val w = math.round(math.exp(-0.01 * age) * 1e9) / 1e9 // round-9, HALF_UP
      (w, emb1(pk % nEmb))
    }.filter(_._1 > 0)
    assert(target.getLong(1) == weighted.length,
      s"n_recent must count only positive-weight edges for customer $ck")
    val expect = weighted.map { case (w, x) => w * x }.sum / weighted.map(_._1).sum
    assert(math.abs(target.getDouble(2) - expect) < 2e-6,
      s"d1 for customer $ck: query ${target.getDouble(2)} vs recomputed $expect")
  }

  test("dsir: the target language scores highest on average") {
    val rows = PipelineOps.q_llm_dsir(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val others = rows.filterNot(_._1 == "en").values
    assert(others.forall(_ < rows("en")),
      s"en (the target) must have the highest avg log importance weight: $rows")
  }

  test("salted join equals the plain join, and the hot key spreads across salts") {
    import graft.engine.Skew
    val ev = Tables.events(spark, sf0001)
    val cust = Tables.customer(spark, sf0001)
    val salted = Skew.saltedJoin(ev, cust, col("user_id"), col("c_custkey"),
        salts = 8, saltSource = col("event_id"))
      .groupBy(col("c_custkey")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plain = ev.join(cust, col("user_id") === col("c_custkey"))
      .groupBy(col("c_custkey")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == plain, "salting must be invisible in the join result")
    // the busiest user's events really scatter over >1 salt bucket
    val hot = ev.groupBy(col("user_id")).count()
      .orderBy(col("count").desc, col("user_id")) // deterministic under ties
      .collect().head.getLong(0)
    val nSalts = ev.filter(col("user_id") === hot)
      .select(pmod(col("event_id"), lit(8)).as("s")).distinct().count()
    assert(nSalts > 1, s"hot user $hot must spread across salt buckets")
  }

  test("edit distance: pair counts bounded by the sample, distances within the prefix cap") {
    val rows = graft.engine.TextOps.q_text_edit_distance(spark, sf001).collect()
    val sampleSizes = Tables.documents(spark, sf001)
      .filter(col("doc_id") % 10 === 0).groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (lang, nPairs, minD) = (r.getString(0), r.getLong(1), r.getInt(2))
      val n = sampleSizes(lang)
      assert(nPairs <= n * (n - 1) / 2, s"$lang: more pairs than C(n,2)")
      assert(minD >= 0 && minD <= 100, s"$lang: distance outside the 100-char prefix bound")
      assert(r.getDouble(3) >= minD, s"$lang: mean below min")
    }
  }

  test("span dedup: duplicated-doc counts are bounded and the share is consistent") {
    val rows = graft.engine.TextOps.q_llm_span_dedup(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDocs, nDup, share) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nDup <= nDocs)
      assert(math.abs(share - math.round(nDup.toDouble / nDocs * 1e6) / 1e6) < 1e-9)
    }
    assert(rows.map(_.getLong(4)).sum > 0,
      "the sf0.01 corpus is known to contain cross-doc duplicated spans")
  }

  test("semdedup: cells partition the vectors; a cell never drops its first vector") {
    val rows = graft.engine.LlmOps.q_llm_semdedup(spark, sf001).collect()
    val total = Tables.embeddings(spark, sf001).count()
    assert(rows.map(_.getLong(1)).sum == total, "cell sizes must partition the corpus")
    rows.foreach(r => assert(r.getLong(2) < r.getLong(1),
      s"cell ${r.getLong(0)}: the keep-first greedy always keeps the earliest vector"))
    assert(rows.map(_.getLong(2)).sum > 0,
      "the sf0.01 corpus is known to contain semantic near-dups at cos >= 0.35")
  }

  test("chunk overlap: every non-first chunk re-covers exactly 16 tokens") {
    val rows = graft.engine.PipelineOps.q_llm_chunk_overlap(spark, sf001).collect()
    rows.foreach { r =>
      val (nDocs, nChunks, overlap) = (r.getLong(1), r.getLong(2), r.getLong(4))
      assert(overlap == 16L * (nChunks - nDocs),
        s"${r.getString(0)}: overlap must be 16 tokens per continuation chunk")
    }
  }

  test("exact-moment stats agree with Spark's built-in stddev_samp and corr") {
    val exact = Relational.q_agg_stats(spark, sf001).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(4))).toMap
    val builtin = Tables.orders(spark, sf001)
      .groupBy(col("o_orderstatus"))
      .agg(stddev_samp(col("o_totalprice")).as("sd"),
        corr(col("o_totalprice"), year(col("o_orderdate")).cast("double")).as("c"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    exact.foreach { case (k, (sd, c)) =>
      assert(math.abs(sd - builtin(k)._1) < 1e-3, s"$k stddev: $sd vs ${builtin(k)._1}")
      assert(math.abs(c - builtin(k)._2) < 1e-6, s"$k corr: $c vs ${builtin(k)._2}")
    }
  }

  test("dedup clusters partition the sample; dups = docs minus canonicals") {
    val rows = graft.engine.LlmOps.q_llm_dedup_clusters(spark, sf001).collect()
    val sampled = Tables.documents(spark, sf001)
      .filter(col("doc_id") % 10 === 0).count()
    assert(rows.map(_.getLong(1)).sum == sampled,
      "per-lang cluster membership must partition the sampled docs")
    rows.foreach { r =>
      assert(r.getLong(3) == r.getLong(1) - r.getLong(2),
        s"${r.getString(0)}: one canonical survives per cluster")
      assert(r.getLong(4) <= r.getLong(1), "a cluster cannot exceed its language sample")
    }
    assert(rows.map(_.getLong(3)).sum > 0,
      "the sf0.01 sample is known to contain J >= 0.8 duplicate groups")
  }

  test("mm_frames: every video byte lands in exactly one frame") {
    val frames = Multimodal.q_mm_frames(spark, sf0001)
      .agg(sum(col("bytes_sum"))).collect()(0).getLong(0)
    val total = Tables.documents(spark, sf0001)
      .filter(col("doc_id") % 3 === 2)
      .agg(sum(length(col("text")))).collect()(0).getLong(0)
    assert(frames == total, "frame bytes must partition the payload bytes")
  }
}
