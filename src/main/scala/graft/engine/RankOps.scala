package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval ranking & evaluation operators (SURVEY.md §2.22) — the
  * fusion/eval layer a hybrid-search training-data pipeline runs on top
  * of its BM25 + ANN first stages: reciprocal-rank fusion of a lexical
  * and a semantic ranking, and graded nDCG@k evaluation of the semantic
  * ranking against label relevance.
  *
  * Scale shape: both operators run on BOUNDED candidate sets by
  * construction — fusion sees the first-stage candidate pool (here the
  * deterministic 10% sample; in production the top-k union the BM25/ANN
  * stages emit per query), and evaluation sees ≤ k ranked rows per
  * query. Every window is keyed (lang / query id); nothing here ever
  * sorts fact-table cardinality.
  */
object RankOps {

  /** RRF dampening constant (Cormack et al. 2009 use k = 60). */
  val RrfK = 60

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher SIGIR 2009:
    * rrf(d) = Σ_r 1/(k + rank_r(d)) — the standard hybrid-search fusion
    * of heterogeneous rankings, robust to incomparable score scales):
    * fuses a LEXICAL ranking (occurrence count of the corpus's top-3
    * df tokens — the BM25 query convention) and a SEMANTIC ranking
    * (cosine to the query vector, vec_id 0 — the cosine_topk convention).
    * Candidate pool = the per-lang 10% document sample INTERSECTED with
    * the embedding id space (the inner join on doc_id = vec_id requires
    * a semantic score; docs without an embedding are not fusable and
    * drop — at sf0.1 that is ~50 of the 500 sampled ids). Production
    * variant: left-join with score_sem = 0 to keep lexical-only docs;
    * the contract pins the intersected pool. Ranks are integers;
    * the two 1/(60+r) terms are round-9 → exact DECIMAL sum (order-blind)
    * → round-6 display; top-5 fused per lang with doc_id ties.
    * One token scan for the lexical signal + one broadcast query vector
    * for the semantic one; both rank windows are keyed by lang over the
    * bounded candidate pool. */
  def q_llm_rrf(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val tok = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    // query terms: corpus top-3 document-frequency tokens (BM25 convention)
    val q = tok.distinct().groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("tok").asc).limit(3)
    val cand = docs.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("lang"))
    // lexical signal: total occurrences of the query terms per candidate
    val lex = tok.join(broadcast(q), Seq("tok"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("score_lex"))
    // semantic signal: cosine to the query embedding (vec_id 0)
    val emb = Tables.embeddings(s, dir)
    val qv = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"))
    val dot = LlmOps.vecDot(s) _
    val sem = emb.crossJoin(broadcast(qv))
      .select(col("vec_id").as("doc_id"),
        round(dot(col("embedding"), col("qv")) /
          (sqrt(dot(col("embedding"), col("embedding"))) *
            sqrt(dot(col("qv"), col("qv")))), 6).as("score_sem"))
    val scored = cand
      .join(lex, Seq("doc_id"), "left").na.fill(0L, Seq("score_lex"))
      .join(sem, Seq("doc_id"))
    val wl = Window.partitionBy(col("lang"))
      .orderBy(col("score_lex").desc, col("doc_id").asc)
    val ws = Window.partitionBy(col("lang"))
      .orderBy(col("score_sem").desc, col("doc_id").asc)
    val wf = Window.partitionBy(col("lang"))
      .orderBy(col("rrf").desc, col("doc_id").asc)
    scored
      .withColumn("rank_lex", row_number().over(wl).cast("bigint"))
      .withColumn("rank_sem", row_number().over(ws).cast("bigint"))
      .withColumn("rrf",
        (round(lit(1.0) / (col("rank_lex") + RrfK), 9).cast("decimal(28,9)") +
          round(lit(1.0) / (col("rank_sem") + RrfK), 9).cast("decimal(28,9)")))
      .withColumn("rank_fused", row_number().over(wf).cast("bigint"))
      .filter(col("rank_fused") <= 5)
      .select(col("lang"), col("rank_fused"), col("doc_id"),
        col("rank_lex"), col("rank_sem"),
        round(col("rrf").cast("double"), 6).as("rrf"))
      .orderBy("lang", "rank_fused")
  }

  /** Graded nDCG@10 retrieval evaluation (Järvelin & Kekäläinen TOIS
    * 2002): queries = vec_id < 10 (broadcast, the knn_join convention),
    * candidates = every other vector, ranking = cosine desc (round-6,
    * neighbor-id ties), graded relevance rel = 2 iff candidate label
    * equals the query label (gain 2^rel − 1 = 3). DCG = Σ gain/log₂(i+1)
    * over the top-10; IDCG from the ideal ranking = the same sum over
    * min(n_rel, 10) all-relevant positions, built from a 10-row spine —
    * per-position terms round-9 → exact DECIMAL sums → one division.
    * Per query: n_rel, dcg, idcg, ndcg. The rank window is keyed by
    * query id; candidate scoring is the broadcast-probe scan ANN
    * evaluation already pays. */
  def q_text_ndcg(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("label").as("qlabel"))
    val dot = LlmOps.vecDot(s) _
    val scoredAll = emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("qlabel"), col("vec_id"), col("label"),
        round(dot(col("embedding"), col("qv")) /
          (sqrt(dot(col("embedding"), col("embedding"))) *
            sqrt(dot(col("qv"), col("qv")))), 6).as("cos_sim"))
    val nRel = scoredAll.groupBy(col("query_id").as("qr"))
      .agg(sum(when(col("label") === col("qlabel"), 1L).otherwise(0L)).as("n_rel"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    val dcg = scoredAll
      .withColumn("pos", row_number().over(w).cast("bigint"))
      .filter(col("pos") <= 10)
      .withColumn("gain",
        when(col("label") === col("qlabel"), lit(3.0)).otherwise(lit(0.0)))
      .groupBy(col("query_id"))
      .agg(sum(round(col("gain") / log2(col("pos") + 1), 9).cast("decimal(28,9)"))
        .as("dcg_d"))
    val spine = s.range(1, 11).select(col("id").as("i"))
    val idcg = nRel.crossJoin(broadcast(spine))
      .filter(col("i") <= least(col("n_rel"), lit(10L)))
      .groupBy(col("qr"), col("n_rel"))
      .agg(sum(round(lit(3.0) / log2(col("i") + 1), 9).cast("decimal(28,9)"))
        .as("idcg_d"))
    dcg.join(idcg, col("query_id") === col("qr"))
      .select(col("query_id"), col("n_rel"),
        round(col("dcg_d").cast("double"), 6).as("dcg"),
        round(col("idcg_d").cast("double"), 6).as("idcg"),
        round(col("dcg_d").cast("double") / col("idcg_d").cast("double"), 6)
          .as("ndcg"))
      .orderBy("query_id")
  }

  /** MAP@10 and MRR@10 over the q_text_ndcg ranking fixture (the binary-
    * relevance companions to nDCG's graded gain — the three metrics every
    * retrieval eval reports together; Manning et al. IR ch. 8): same 10
    * broadcast query vectors, same cosine ranking with the vec_id
    * tiebreak, relevance = label match. AP@10 = Σ_{rel pos k ≤ 10}
    * P@k / min(n_rel, 10) with each P@k = cum_rel/k rounded-9 and
    * summed as exact DECIMAL (order-blind, same device as DCG);
    * RR@10 = 1/first-relevant-position, 0 when no relevant in the top
    * 10. Per-query rows so the macro means are one trivial avg away —
    * kept per-query like ndcg for slice-level debugging. The rank
    * window is keyed by query id; candidate scoring is the broadcast-
    * probe scan the ANN eval tier already pays. */
  def q_rank_map_mrr(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("label").as("qlabel"))
    val dot = LlmOps.vecDot(s) _
    val scoredAll = emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("qlabel"), col("vec_id"), col("label"),
        round(dot(col("embedding"), col("qv")) /
          (sqrt(dot(col("embedding"), col("embedding"))) *
            sqrt(dot(col("qv"), col("qv")))), 6).as("cos_sim"))
    val nRel = scoredAll.groupBy(col("query_id").as("qr"))
      .agg(sum(when(col("label") === col("qlabel"), 1L).otherwise(0L)).as("n_rel"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    val top = scoredAll
      .withColumn("pos", row_number().over(w).cast("bigint"))
      .filter(col("pos") <= 10)
      .withColumn("rel",
        when(col("label") === col("qlabel"), 1L).otherwise(0L))
      .withColumn("cum_rel", sum(col("rel")).over(
        Window.partitionBy(col("query_id")).orderBy(col("pos"))))
    val ap = top.groupBy(col("query_id"))
      .agg(sum(when(col("rel") === 1L,
          round(col("cum_rel").cast("double") / col("pos").cast("double"), 9)
            .cast("decimal(28,9)"))
          .otherwise(lit(0).cast("decimal(28,9)"))).as("ap_num"),
        min(when(col("rel") === 1L, col("pos"))).as("first_rel"))
    nRel.join(ap, col("qr") === col("query_id"))
      .select(col("query_id"), col("n_rel"),
        round(when(col("n_rel") === 0L, 0.0)
          .otherwise(col("ap_num").cast("double") /
            least(col("n_rel"), lit(10L)).cast("double")), 6).as("ap10"),
        round(when(col("first_rel").isNull, 0.0)
          .otherwise(lit(1.0) / col("first_rel").cast("double")), 6).as("rr10"))
      .orderBy("query_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_llm_rrf" -> q_llm_rrf _,
    "q_text_ndcg" -> q_text_ndcg _,
    "q_rank_map_mrr" -> q_rank_map_mrr _
  )
}
