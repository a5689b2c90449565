package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.LlmOps

/** Round-15 (driver round) pins: the tightened bracket-oracle envelopes
  * are FALSIFIABLE — a bracket oracle whose booleans cannot fail
  * certifies nothing (VERDICT r14 item 4), so each envelope boolean is
  * proven to flip under a deliberately perturbed pipeline while the
  * healthy pipeline stays green. */
class Round21Spec extends AnyFunSuite {
  import TestSpark._

  // minhashAudit output: (n_md5_pairs, n_md5_strong, recall_strong_ok,
  // recall_all_ok, precision_ok, xx_nonempty)
  private def audit(xx: org.apache.spark.sql.DataFrame,
      xxS: org.apache.spark.sql.DataFrame) =
    LlmOps.minhashAudit(spark, sf0001, xx, xxS).collect()(0)

  test("minhash audit: healthy pipeline green; perturbed pipelines flip each boolean") {
    val xx = LlmOps.minhashXxPairs(spark, sf0001)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    val xxS = LlmOps.minhashXxPairs(spark, sf0001, sampled = true)

    val healthy = audit(xx, xxS)
    assert(healthy.getBoolean(2), "healthy: recall_strong_ok")
    assert(healthy.getBoolean(3), "healthy: recall_all_ok")
    assert(healthy.getBoolean(4), "healthy: precision_ok")
    assert(healthy.getBoolean(5), "healthy: xx_nonempty")

    // Recall COLLAPSE: drop ~2/3 of the xx pair set — the within-band
    // lower floor (MinhashTwinRecallAllBand._1 = 0.84) must trip.
    val collapsed = audit(xx.filter(col("doc_a") % 3 === 0), xxS)
    assert(!collapsed.getBoolean(3),
      "recall_all_ok must flip when the xx pass loses twin pairs")

    // Recall JUMP: graft the md5 twin's own pairs into the xx set so
    // twin recall hits 1.0 — past the band's UPPER edge (0.98): an
    // operating point that suddenly catches everything no longer
    // matches the 4x2 banding designation (two-sided band, r15).
    val twin = LlmOps.minhashMd5Pairs(spark, sf0001)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    val jumped = audit(xx.unionByName(twin).distinct(), xxS)
    assert(!jumped.getBoolean(3),
      "recall_all_ok must flip when recall jumps past the measured band")

    // Precision DRIFT: corrupt the masks-path jaccard carried by the
    // sampled pairs — the independent token-array recompute disagrees
    // on every pair, so the r15 precision leg must trip.
    val corrupted = xxS.withColumn("jaccard", round(col("jaccard") + lit(0.2), 6))
    val drifted = audit(xx, corrupted)
    assert(!drifted.getBoolean(4),
      "precision_ok must flip when the independent recompute disagrees")
  }

  test("louvain level 2: coarsening preserves modularity exactly (Q invariance)") {
    // The identity that proves the level-2 sweep really runs on the
    // condensed graph: with k_i = Σw_ij + 2·self_i and W_c including
    // self-loop mass, the singleton-start level-2 score Σ(4m·self_i −
    // k_i²) is ALGEBRAICALLY the level-1 partition's Σ(4m·L_c − D_c²) —
    // both integers, so the match must be exact, not approximate.
    val l1 = SparkEntry.queries("q_graph_louvain_move")(spark, sf0001).collect()(0)
    val l2 = SparkEntry.queries("q_graph_louvain_level2")(spark, sf0001).collect()(0)
    assert(l2.getAs[Long]("q4m2_before") == l1.getAs[Long]("q4m2_after"),
      "level-2 'before' must equal level-1 'after' exactly")
    assert(l2.getAs[Long]("n_communities") <= l2.getAs[Long]("n_super_nodes"),
      "the level-2 sweep may only merge communities")
    assert(l1.getAs[Long]("n_communities") == l2.getAs[Long]("n_super_nodes"),
      "level-2 super-nodes are exactly level-1 communities")
  }
}
