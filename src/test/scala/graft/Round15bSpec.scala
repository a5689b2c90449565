package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{RankOps, StatsOps, Tables, TextOps}

/** Plain-Scala replays of the round-15 batch-8 operators at sf0.001 —
  * the independent-mirror discipline of Round13/14/15Spec: every number
  * the query emits is recomputed from the raw fixture with driver-side
  * Scala (same pinned IEEE op order where doubles are involved), then
  * compared exactly. */
class Round15bSpec extends AnyFunSuite {
  import TestSpark._

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def r9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q_agg_spearman equals a driver-side average-rank replay") {
    import org.apache.spark.sql.functions._
    val rows = Tables.lineitem(spark, sf0001)
      .select(col("l_returnflag"), col("l_quantity").cast("bigint"),
        round(col("l_extendedprice") * 100, 0).cast("bigint"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = rows.groupBy(_._1).toSeq.map { case (g, xs) =>
      // 2×average rank: for value v, 2r̄ = 2·|{u < v}| + |{u = v}| + 1
      def rank2(vals: Seq[Long]): Map[Long, Long] = {
        val freq = vals.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val sorted = freq.keys.toSeq.sorted
        var cum = 0L
        sorted.map { v =>
          val f = freq(v); val r = 2 * cum + f + 1; cum += f; v -> r
        }.toMap
      }
      val rx = rank2(xs.map(_._2)); val ry = rank2(xs.map(_._3))
      val n = xs.length.toLong
      var sx = 0L; var sy = 0L; var sxx = 0L; var syy = 0L; var sxy = 0L
      xs.foreach { case (_, x, y) =>
        val a = rx(x); val b = ry(y)
        sx += a; sy += b; sxx += a * a; syy += b * b; sxy += a * b
      }
      val nD = n.toDouble
      val rho = (nD * sxy - sx.toDouble * sy.toDouble) /
        (math.sqrt(nD * sxx - sx.toDouble * sx.toDouble) *
          math.sqrt(nD * syy - sy.toDouble * sy.toDouble))
      (g, n, r6(rho))
    }.sortBy(_._1)
    val got = StatsOps.q_agg_spearman(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.nonEmpty && got == expected,
      s"spearman replay mismatch:\n got=$got\n exp=$expected")
  }

  /** Shared driver-side one-way-ANOVA assembly mirroring anovaFrom:
    * (k, n, df1, df2, F) from per-group (n, Σv, Σv²) with the s²/n
    * terms rounded-9 and summed exactly. sg/qg passed as BigDecimal so
    * the Levene decimal z-sums reuse it. */
  private def anovaReplay(grp: Seq[(Long, BigDecimal, BigDecimal)],
      termScale: Int): (Long, Long, Long, Long, Double) = {
    val k = grp.size.toLong
    val n = grp.map(_._1).sum
    val s = grp.map(_._2).sum.toDouble
    val q = grp.map(_._3).sum.toDouble
    val st = grp.map { case (ng, sg, _) =>
      BigDecimal(sg.toDouble * sg.toDouble / ng.toDouble)
        .setScale(termScale, BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble
    val ssb = st - s * s / n.toDouble
    val ssw = q - st
    (k, n, k - 1, n - k, r6((ssb / (k - 1).toDouble) / (ssw / (n - k).toDouble)))
  }

  private def customerCents(): Seq[(String, Long)] = {
    import org.apache.spark.sql.functions._
    Tables.customer(spark, sf0001)
      .select(col("c_mktsegment"), round(col("c_acctbal") * 100, 0).cast("bigint"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  test("q_agg_anova equals a driver-side sums-of-squares replay") {
    val grp = customerCents().groupBy(_._1).values.map { xs =>
      (xs.size.toLong, BigDecimal(xs.map(_._2).sum),
        BigDecimal(xs.map(t => t._2 * t._2).sum))
    }.toSeq
    val expected = anovaReplay(grp, 9)
    val got = StatsOps.q_agg_anova(spark, sf0001).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).head
    assert(got == expected, s"anova replay mismatch: got=$got exp=$expected")
  }

  test("q_agg_levene equals a driver-side deviation-ANOVA replay") {
    val cents = customerCents()
    val means = cents.groupBy(_._1).view.mapValues { xs =>
      (xs.size.toLong, xs.map(_._2).sum)
    }.toMap
    val grp = cents.groupBy(_._1).toSeq.map { case (g, xs) =>
      val (ng, sg) = means(g)
      val zs = xs.map(t =>
        math.abs(t._2.toDouble - sg.toDouble / ng.toDouble) / 100.0)
      (ng,
        zs.map(z => BigDecimal(z).setScale(9, BigDecimal.RoundingMode.HALF_UP)).sum,
        zs.map(z => BigDecimal(z * z).setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum)
    }
    val expected = anovaReplay(grp, 6)
    val got = StatsOps.q_agg_levene(spark, sf0001).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).head
    assert(got == expected, s"levene replay mismatch: got=$got exp=$expected")
  }

  test("q_stats_fdr_bh equals a driver-side step-up replay") {
    import org.apache.spark.sql.functions._
    val cents = Tables.events(spark, sf0001)
      .select(col("event_type"), (col("user_id") % 20).as("ub"),
        round(col("value") * 100, 0).cast("bigint").as("c"))
      .filter(col("c") > 0)
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2)))
    val p0 = 1.0 / 9.0
    val tests = cents.groupBy(_._1).toSeq
      .filter(_._2.length >= 20)
      .flatMap { case ((et, ub), xs) =>
        val n = xs.length.toLong
        val nD1 = xs.count(_._2.toString.head == '1').toLong
        val nEven = xs.count(_._2 % 2 == 0).toLong
        val zU = (nD1.toDouble - n.toDouble * p0) /
          math.sqrt(n.toDouble * p0 * (1.0 - p0))
        val zP = (2 * nEven - n).toDouble / math.sqrt(n.toDouble)
        Seq(("uniform_d1", et, ub, n, zU), ("parity", et, ub, n, zP))
      }
      .map { case (fam, et, ub, n, z) =>
        (fam, et, ub, n, z, math.exp(-z * z / 2.0))
      }
      .sortBy { case (fam, et, ub, _, _, pp) => (pp, fam, et, ub) }
    val m = tests.length.toLong
    val ranked = tests.zipWithIndex.map { case (t, i0) => (t, i0 + 1L) }
    val kbh = ranked.map { case ((_, _, _, _, _, pp), i) =>
      if (pp * m.toDouble <= i.toDouble * 0.05) i else 0L
    }.max
    val expected = ranked.map { case ((fam, et, ub, n, z, pp), i) =>
      (fam, et, ub, n, r6(z), r9(pp), i, i <= kbh)
    }
    val got = StatsOps.q_stats_fdr_bh(spark, sf0001).collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6), r.getBoolean(7))).toSeq
    assert(got.nonEmpty && got == expected,
      s"fdr_bh replay mismatch:\n got=${got.take(5)}…\n exp=${expected.take(5)}…")
    // both families present; the step-up must not reject the ENTIRE pool
    assert(got.map(_._1).distinct.sorted == Seq("parity", "uniform_d1"))
    assert(got.exists(!_._8))
  }

  test("q_rank_map_mrr is consistent with the shared ndcg fixture") {
    val mapMrr = RankOps.q_rank_map_mrr(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val ndcg = RankOps.q_text_ndcg(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(mapMrr.nonEmpty)
    mapMrr.foreach { case (qid, nRel, ap, rr) =>
      // same fixture → same relevant-candidate count per query
      assert(ndcg.get(qid).forall(_ == nRel), s"n_rel mismatch for q$qid")
      assert(ap >= 0.0 && ap <= 1.0 && rr >= 0.0 && rr <= 1.0)
      // RR@10 is 0 or exactly 1/k for an integer rank k ≤ 10
      val rrOk = rr == 0.0 ||
        (1 to 10).exists(k => r6(1.0 / k) == rr)
      assert(rrOk, s"rr=$rr not of form 1/k")
      // AP ≤ 1 requires rel hits; a nonzero AP implies a nonzero RR
      if (ap > 0.0) assert(rr > 0.0)
    }
  }

  test("q_llm_containment equals a driver-side trigram-set replay") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf0001)
      .filter(col("doc_id") % 10 === 0 && length(col("text")) >= 3)
      .select(col("doc_id"), col("lang"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val sets = docs.map { case (id, lang, text) =>
      (id, lang, text.sliding(3).toSet)
    }
    val expected = (for {
      (ida, lang, ga) <- sets
      (idb, langB, gb) <- sets
      if lang == langB && ida != idb
      ic = ga.intersect(gb).size
      cont = ic.toDouble / ga.size.toDouble
      if cont >= 0.5
    } yield (lang, ida, idb, ga.size.toLong, r6(cont)))
      .sortBy(t => (t._1, t._2, t._3)).toSeq
    val got = TextOps.q_llm_containment(spark, sf0001).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got == expected,
      s"containment replay mismatch: got=${got.size} exp=${expected.size}")
    // asymmetry sanity: every double-direction pair shares one exact
    // intersection ic = C·|A|, so C(a→b)·na == C(b→a)·nb up to round-6
    val byPair = got.map(t => ((t._2, t._3), (t._4, t._5))).toMap
    byPair.foreach { case ((a, b), (na, c)) =>
      byPair.get((b, a)).foreach { case (nb, c2) =>
        assert(math.abs(c * na - c2 * nb) < 1e-3,
          s"ic mismatch across directions for ($a,$b)")
      }
    }
  }
}
