package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators (SURVEY.md §2.19) — the classic published
  * web-corpus filters re-expressed relationally: C4-style heuristic
  * quality rules (Raffel et al. 2020 §2.2), CCNet perplexity bucketing
  * (Wenzek et al. 2020 §4.3), and ROUGE-2 overlap scoring (Lin 2004)
  * as a near-dup diagnostic between adjacent documents.
  *
  * Determinism: every filter rule is an INTEGER comparison (count·k ≥
  * count·k — no division, no float, no tie class); ROUGE surfaces exact
  * integer counts plus raw single-division doubles (identical operands →
  * identical bits in both engines, no rounding needed). */
object CurationOps {

  /** C4-style rule thresholds, tuned to discriminate on the synthetic
    * corpus (word counts 10–99, diversity 0.28–1.0, top-term share
    * 0.05–0.30, mean word length 3.7–5.3): scaled-integer forms of
    * wc ∈ [25, 90], distinct/wc ≥ 0.4, max_cnt/wc ≤ 0.12,
    * mean word length ∈ [4, 5]. */
  val C4MinWords = 25
  val C4MaxWords = 90

  /** Heuristic quality filtering (the C4 recipe shape): per document,
    * token accounting from ONE explode + one aggregation chain (wc, the
    * distinct-token count, and the top-term count all come from the same
    * token-count table), then pure integer rule evaluation. `reason`
    * names the FIRST failing rule in a fixed order — what a curation
    * pipeline logs for drop-rate dashboards. Linear scan shape: explode,
    * two keyed aggs, one broadcast-free join back to the doc table. */
  def q_llm_c4_filter(s: SparkSession, dir: String): DataFrame = {
    val tc = Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
    val stats = tc.groupBy(col("doc_id").as("sid"))
      .agg(sum(col("c")).as("wc"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("max_cnt"))
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .join(stats, col("doc_id") === col("sid"))
      // single-space-joined text: total token chars = n_chars - (wc - 1)
      .withColumn("tok_chars", col("n_chars") - (col("wc") - 1))
    val reason = when(col("wc") < C4MinWords, "too_short")
      .when(col("wc") > C4MaxWords, "too_long")
      .when(col("n_distinct") * 10 < col("wc") * 4, "low_diversity")
      .when(col("max_cnt") * 100 > col("wc") * 12, "repetitive")
      .when(col("tok_chars") < col("wc") * 4, "short_words")
      .when(col("tok_chars") > col("wc") * 5, "long_words")
      .otherwise("kept")
    d.select(col("doc_id"), col("lang"), col("wc"), col("n_distinct"),
        col("max_cnt"), col("tok_chars"), reason.as("reason"),
        (reason === "kept").as("keep"))
      .orderBy("doc_id")
  }

  /** CCNet-style perplexity bucketing: held-out docs (doc_id % 10 = 0)
    * score unigram cross-entropy against the train-split LM (the exact
    * q_text_unigram_xent scoring), then per-language NTILE(3) over
    * (xent, doc_id) splits head/middle/tail — head = lowest perplexity =
    * keep tier. Bucket stats surface exact values only: counts, min/max
    * of the round-6 xent, and the exact DECIMAL sum (an AVG of 6dp values
    * could land on a .5 tie at the 7th decimal — the sum cannot).
    * Scale shape: the LM is vocabulary-sized (broadcast); the NTILE runs
    * per-language over held-out docs only. */
  def q_llm_ccnet_bucket(s: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("tok"))
    val train = tok.filter(col("doc_id") % 10 =!= 0)
    val counts = train.groupBy(col("lang").as("ml"), col("tok").as("mt"))
      .agg(count(lit(1)).as("c"))
    val totals = counts.groupBy(col("ml")).agg(sum(col("c")).as("tot"))
    val model = counts.join(totals, "ml")
      .select(col("ml"), col("mt"), (col("c").cast("double") / col("tot")).as("p"))
    val xent = tok.filter(col("doc_id") % 10 === 0)
      .join(broadcast(totals.select(col("ml").as("jl"), col("tot").as("jtot"))),
        col("lang") === col("jl"))
      .join(broadcast(model), col("lang") === col("ml") && col("tok") === col("mt"),
        "left_outer")
      .select(col("doc_id"), col("lang"),
        (-log(coalesce(col("p"), lit(1.0) / col("jtot")))).as("nll"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(round(avg(col("nll")), 6).as("xent"))
    val w = Window.partitionBy(col("lang")).orderBy(col("xent"), col("doc_id"))
    xent.withColumn("bucket", ntile(3).over(w))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("xent")).as("min_xent"),
        max(col("xent")).as("max_xent"),
        sum(col("xent").cast("decimal(18,6)")).cast("double").as("xent_sum"))
      .orderBy("lang", "bucket")
  }

  /** ROUGE-2 between adjacent same-language documents (the reference-free
    * overlap diagnostic a dedup cascade logs): pairs are (doc, next doc
    * by id) per language; the bigram multiset intersection Σ_g min(c_a,
    * c_b) and both totals stay exact integers; precision/recall/F1 are
    * raw single divisions (2·inter/(t_a+t_b) for F1 — same numerator
    * algebra as the AUC op, no rounding). Bigrams are 1-based
    * element_at so both engines index identically. */
  def q_text_rouge2(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("toks"))
      .withColumn("wc", size(col("toks")))
      .filter(col("wc") >= 2)
    val bg = d.select(col("doc_id"), explode(expr(
        "transform(sequence(1, wc - 1)," +
          " i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))")).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
    val pairs = d.select(col("lang"), col("doc_id").as("doc_a"),
        (col("wc") - 1).cast("bigint").as("ta"),
        lead(col("doc_id"), 1).over(w).as("doc_b"),
        lead((col("wc") - 1).cast("bigint"), 1).over(w).as("tb"))
      .filter(col("doc_b").isNotNull)
    val inter = pairs
      .join(bg.select(col("doc_id").as("ba"), col("g"), col("c").as("ca")),
        col("doc_a") === col("ba"))
      .join(bg.select(col("doc_id").as("bb"), col("g").as("gb"), col("c").as("cb")),
        col("doc_b") === col("bb") && col("g") === col("gb"))
      .groupBy(col("doc_a").as("ia"))
      .agg(sum(least(col("ca"), col("cb"))).as("inter"))
    pairs.join(inter, col("doc_a") === col("ia"), "left_outer")
      .select(col("lang"), col("doc_a"), col("doc_b"),
        coalesce(col("inter"), lit(0L)).as("n_overlap"), col("ta"), col("tb"))
      .withColumn("rouge2_p", col("n_overlap").cast("double") / col("tb"))
      .withColumn("rouge2_r", col("n_overlap").cast("double") / col("ta"))
      .withColumn("rouge2_f1",
        (lit(2.0) * col("n_overlap")).cast("double") / (col("ta") + col("tb")))
      .orderBy("lang", "doc_a")
  }

  /** BLEU-2 (Papineni et al. 2002) between the SAME adjacent same-lang
    * doc pairs q_text_rouge2 scores — precision-oriented MT metric
    * beside the recall-oriented ROUGE, so a text-similarity triage
    * reads both on identical pairs: clipped unigram/bigram matches
    * m_n = Σ min(c_cand, c_ref) stay exact integers (two keyed
    * multiset-intersection joins, the rouge2 device), modified
    * precisions p_n are raw single divisions, brevity penalty
    * BP = exp(1 − r/c) for c ≤ r else 1 (exp drift absorbed by the
    * round-6 emit), BLEU-2 = BP·√(p₁·p₂) pinned. Doc_a is the
    * candidate, doc_b the reference. */
  def q_text_bleu2(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("toks"))
      .withColumn("wc", size(col("toks")))
      .filter(col("wc") >= 2)
    val ug = d.select(col("doc_id"), explode(col("toks")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
    val bg = d.select(col("doc_id"), explode(expr(
        "transform(sequence(1, wc - 1)," +
          " i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))")).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
    val pairs = d.select(col("lang"), col("doc_id").as("doc_a"),
        col("wc").cast("bigint").as("ua"),
        lead(col("doc_id"), 1).over(w).as("doc_b"),
        lead(col("wc").cast("bigint"), 1).over(w).as("ub"))
      .filter(col("doc_b").isNotNull)
    val m1 = pairs
      .join(ug.select(col("doc_id").as("a1"), col("w"), col("c").as("ca")),
        col("doc_a") === col("a1"))
      .join(ug.select(col("doc_id").as("b1"), col("w").as("w2"), col("c").as("cb")),
        col("doc_b") === col("b1") && col("w") === col("w2"))
      .groupBy(col("doc_a").as("i1"))
      .agg(sum(least(col("ca"), col("cb"))).as("m1"))
    val m2 = pairs
      .join(bg.select(col("doc_id").as("a2"), col("g"), col("c").as("ca")),
        col("doc_a") === col("a2"))
      .join(bg.select(col("doc_id").as("b2"), col("g").as("g2"), col("c").as("cb")),
        col("doc_b") === col("b2") && col("g") === col("g2"))
      .groupBy(col("doc_a").as("i2"))
      .agg(sum(least(col("ca"), col("cb"))).as("m2"))
    pairs
      .join(m1, col("doc_a") === col("i1"), "left_outer")
      .join(m2, col("doc_a") === col("i2"), "left_outer")
      .select(col("lang"), col("doc_a"), col("doc_b"), col("ua"), col("ub"),
        coalesce(col("m1"), lit(0L)).as("n_match1"),
        coalesce(col("m2"), lit(0L)).as("n_match2"))
      .withColumn("p1", col("n_match1").cast("double") / col("ua"))
      .withColumn("p2", col("n_match2").cast("double") / (col("ua") - 1))
      .withColumn("bp", when(col("ua") > col("ub"), lit(1.0))
        .otherwise(exp(lit(1.0) -
          col("ub").cast("double") / col("ua").cast("double"))))
      .select(col("lang"), col("doc_a"), col("doc_b"), col("ua"), col("ub"),
        col("n_match1"), col("n_match2"),
        round(col("bp"), 6).as("brevity_penalty"),
        round(col("bp") * sqrt(col("p1") * col("p2")), 6).as("bleu2"))
      .orderBy("lang", "doc_a")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_llm_c4_filter" -> q_llm_c4_filter _,
    "q_llm_ccnet_bucket" -> q_llm_ccnet_bucket _,
    "q_text_rouge2" -> q_text_rouge2 _,
    "q_text_bleu2" -> q_text_bleu2 _
  )
}
