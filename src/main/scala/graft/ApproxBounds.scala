package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.{LlmOps, Relational}

/** Measured error bounds for the contract's 4 self-checked (non-oracled)
  * approximate operators, surfaced as an ARTIFACT rather than a spec
  * assertion (VERDICT r6 item 7): the driver archives the JSON next to
  * the bench record, so the self-checked tier is auditable without
  * reading the test suite. Each measurement compares the approximate
  * operator against its exact twin ON THE SAME INPUT, engine-side
  * (joins + one-row aggregates — nothing data-sized reaches the driver):
  *
  *  - HLL++ (`q_agg_approx_distinct`) vs exact `countDistinct` — max /
  *    mean relative error per event_type (Spark's default rsd 5%);
  *  - GK quantiles (`q_agg_approx_percentile`, accuracy 10000) vs the
  *    exact sort-based percentiles — max relative error over p50/p90;
  *  - banded MinHash LSH (`q_llm_minhash_lsh`) vs the exact-quadratic
  *    Jaccard ground truth — precision of verified candidates (expected
  *    1.0: the verify step IS the exact jaccard on candidates) and
  *    recall on strong near-dups (J ≥ 0.8, where the 4×2 banding's
  *    collision probability 1-(1-J²)⁴ ≥ 0.98).
  *
  * The xxhash64 SimHash fast path has no same-input exact twin (its md5
  * sibling runs on a different sample by design) — its self-check stays
  * unit-level (hamming bounds in TextMmSpec) and is noted here by key.
  */
object ApproxBounds {

  def measureJson(s: SparkSession, dir: String): String = {
    def f6(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.6f", Double.box(v))
    // HLL vs exact
    val ex = Relational.q_agg_count_distinct(s, dir)
      .select(col("event_type"), col("n_users"))
    val ap = Relational.q_agg_approx_distinct(s, dir)
      .select(col("event_type").as("et"), col("approx_users"))
    val hll = ex.join(ap, col("event_type") === col("et"))
      .select((abs(col("approx_users") - col("n_users")).cast("double")
        / col("n_users").cast("double")).as("re"))
      .agg(max(col("re")).as("mx"), avg(col("re")).as("av")).collect()(0)
    // GK vs exact percentiles
    val exp = Relational.q_agg_percentiles(s, dir)
      .select(col("o_orderstatus"), col("p50"), col("p90"))
    val app = Relational.q_agg_approx_percentile(s, dir)
      .select(col("o_orderstatus").as("st"), col("p50_approx"), col("p90_approx"))
    val gk = exp.join(app, col("o_orderstatus") === col("st"))
      .select(greatest(
        abs(col("p50_approx") - col("p50")) / abs(col("p50")),
        abs(col("p90_approx") - col("p90")) / abs(col("p90"))).as("re"))
      .agg(max(col("re")).as("mx")).collect()(0)
    // LSH precision/recall vs exact ground truth
    val cand = LlmOps.q_llm_minhash_lsh(s, dir).select(col("doc_a"), col("doc_b"))
    val exact = LlmOps.q_llm_jaccard_pairs(s, dir)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    val strong = exact.filter(col("jaccard") >= 0.8)
    val nStrong = strong.count()
    val nStrongHit = strong.join(cand, Seq("doc_a", "doc_b"), "left_semi").count()
    val nCand = cand.count()
    val nCandTrue = cand
      .join(exact.filter(col("jaccard") >= 0.5), Seq("doc_a", "doc_b"), "left_semi")
      .count()
    val recall = if (nStrong == 0) 1.0 else nStrongHit.toDouble / nStrong
    val precision = if (nCand == 0) 1.0 else nCandTrue.toDouble / nCand
    s"""{"sf":"$dir",""" +
      s""""hll":{"max_rel_err":${f6(hll.getDouble(0))},"avg_rel_err":${f6(hll.getDouble(1))}},""" +
      s""""gk":{"max_rel_err":${f6(gk.getDouble(0))}},""" +
      s""""minhash_lsh":{"n_strong":$nStrong,"recall_strong":${f6(recall)},""" +
      s""""n_candidates":$nCand,"precision":${f6(precision)}},""" +
      s""""simhash_xx":"unit-level self-check only (no same-input exact twin); see TextMmSpec"}"""
  }
}
