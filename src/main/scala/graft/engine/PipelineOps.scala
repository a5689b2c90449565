package graft.engine

import graft.engine.Ckpt.CkptOps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation pipeline operators beyond the dedup/similarity
  * core (driver north star BASELINE.json:6): the pre-training steps a
  * 100 TB corpus pipeline runs between raw crawl and tokenizer —
  * sequence packing, train/test contamination checks, PII scrubbing,
  * stratified sampling, normalization-aware dedup accounting, and
  * domain-mixture reweighting. Every op is a linear scan + keyed
  * aggregation (or a bounded gram join) and carries a DuckDB oracle.
  */
object PipelineOps {

  /** Tokenizer context length for sequence packing. */
  val PackLen = 2048L

  private def nTokens = size(split(col("text"), " ")).cast("bigint")

  /** Greedy sequence packing: concatenate docs per lang in doc_id order
    * and cut every 2048 tokens; a doc's pack is determined by the token
    * offset where it starts (docs may straddle pack boundaries — the
    * standard pre-training packing semantics). One window scan, no
    * shuffle beyond the per-lang sort — at 100 TB this is the
    * sort-within-partition pass a packer job runs per shard. */
  def q_llm_pack_sequences(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(s, dir)
      .select(col("lang"), col("doc_id"), nTokens.as("nt"))
      .withColumn("cum_before", coalesce(sum(col("nt")).over(w), lit(0L)))
      .withColumn("pack_id", expr(s"cum_before div $PackLen"))
      .groupBy(col("lang"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("pack_tokens"))
      .orderBy("lang", "pack_id")
  }

  /** Train/test contamination: word-8-gram overlap between the held-out
    * sample (doc_id % 10 = 0) and the training split. A test doc is
    * contaminated when ANY of its 8-grams appears in any same-lang train
    * doc (Brown et al. 2020, GPT-3 appendix C methodology, n=8).
    * Scale shape: distinct-gram semi-join — the train gram set shuffles
    * once, candidates prune to distinct (lang, gram). */
  def q_llm_contamination(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("toks"))
    // Guard len<8: Spark's sequence(1, <=0) would DESCEND (see
    // q_llm_ngram_jaccard); the oracle's range() is simply empty.
    val g8 = expr(
      """case when size(toks) >= 8
           then array_distinct(transform(sequence(1, size(toks) - 7),
                i -> concat_ws(' ', slice(toks, i, 8))))
           else cast(array() as array<string>) end""")
    val test = docs.filter(col("doc_id") % 10 === 0)
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    val trainG = train.select(col("lang").as("tl"), explode(g8).as("tg")).distinct()
    val testG = test.select(col("doc_id"), col("lang"), explode(g8).as("g")).distinct()
    val contam = testG
      .join(trainG, col("lang") === col("tl") && col("g") === col("tg"), "left_semi")
      .select(col("lang"), col("doc_id")).distinct()
      .groupBy(col("lang")).agg(count(lit(1)).as("c"))
    test.groupBy(col("lang")).agg(count(lit(1)).as("n_test"))
      .join(contam, Seq("lang"), "left_outer")
      .select(col("lang"), col("n_test"), coalesce(col("c"), lit(0L)).as("n_contam"))
      .orderBy("lang")
  }

  /** Blocklist + digit-run scrubbing (the regex-redaction pass a PII
    * pipeline runs; the lexicon here stands in for a name/email/phone
    * pattern bank). Pure per-row regexes — embarrassingly parallel. */
  val PiiPattern = "customer|supplier|order|[0-9]{3,}"

  def q_llm_pii_redact(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("lang"),
        size(regexp_extract_all(col("text"), lit(PiiPattern), lit(0))).as("hits"),
        length(regexp_replace(col("text"), PiiPattern, "<PII>")).as("red_len"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("hits") > 0, 1L).otherwise(0L)).as("docs_with_hits"),
        sum(col("hits")).cast("bigint").as("total_hits"),
        sum(col("red_len")).cast("bigint").as("sum_redacted_chars"))
      .orderBy("lang")

  /** Deterministic stratified sampling: every 10th doc per
    * (lang, source) stratum in doc_id order — reproducible corpus
    * subsetting without RNG state (window row_number, one shuffle on the
    * stratum key). */
  def q_llm_sample_stratified(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang"), col("source")).orderBy(col("doc_id"))
    Tables.documents(s, dir)
      .select(col("lang"), col("source"), col("doc_id"), nTokens.as("nt"))
      .withColumn("rn", row_number().over(w))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("rn") % 10 === 1, 1L).otherwise(0L)).as("n_sampled"),
        sum(when(col("rn") % 10 === 1, col("nt")).otherwise(0L)).as("sampled_tokens"))
      .orderBy("lang", "source")
  }

  /** Normalization-aware dedup accounting: lowercase, strip
    * non-alphanumerics, collapse whitespace → md5 fingerprint; distinct
    * raw hashes vs distinct normalized hashes per lang quantifies how
    * much near-duplication pure normalization already removes. */
  def q_text_normalize(s: SparkSession, dir: String): DataFrame = {
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
    Tables.documents(s, dir)
      .select(col("lang"),
        md5(col("text").cast("binary")).as("hraw"),
        md5(norm.cast("binary")).as("hnorm"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("hraw")).as("n_distinct_raw"),
        countDistinct(col("hnorm")).as("n_distinct_norm"))
      .orderBy("lang")
  }

  /** Domain-mixture reweighting: per-lang token share vs a uniform
    * target mix (1/5 each) → sampling weight target/actual. The
    * token-count aggregation is the only pass over data; the mixture
    * arithmetic is on the 5-row summary. */
  def q_llm_domain_mix(s: SparkSession, dir: String): DataFrame = {
    val perLang = Tables.documents(s, dir)
      .groupBy(col("lang")).agg(sum(nTokens).as("n_tokens"))
    val total = perLang.agg(sum(col("n_tokens")).as("total"))
    perLang.crossJoin(broadcast(total))
      .select(col("lang"), col("n_tokens"),
        round(col("n_tokens") / col("total"), 6).as("share"),
        round(lit(0.2) * col("total") / col("n_tokens"), 6).as("weight"))
      .orderBy("lang")
  }

  /** Deterministic rejection sampling — the APPLY step of domain-mixture
    * reweighting (q_llm_domain_mix computes the weights; this executes
    * them, Xie et al. 2023's resampled-corpus materialization): doc kept
    * iff u(doc) < p(lang), where u is an md5-uniform in [0,1) (stateless,
    * reproducible — re-running the pipeline regenerates the identical
    * subsample, the property a training corpus needs) and p = min(1,
    * 0.5·target/actual token share). Every arithmetic step is a fixed
    * IEEE double sequence, so the DuckDB oracle reproduces keep decisions
    * bit-exactly — no rounding anywhere.
    *
    * Scale: two tiny broadcast joins (per-lang totals) onto one corpus
    * scan; the keep decision is scan-local. */
  def q_llm_rejection_sample(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), nTokens.as("nt"))
    val perLang = docs.groupBy(col("lang")).agg(sum(col("nt")).as("lang_tokens"))
    val total = perLang.agg(sum(col("lang_tokens")).as("total"))
    docs.join(broadcast(perLang), "lang")
      .crossJoin(broadcast(total))
      .withColumn("pk",
        least(lit(1.0), lit(0.5) * (lit(0.2) * col("total") / col("lang_tokens"))))
      .withColumn("u",
        Dsl.md5Hash60(concat(lit("rs:"), col("doc_id").cast("string"))) /
          lit(1152921504606846976L).cast("double"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("u") < col("pk"), 1L).otherwise(0L)).as("n_kept"),
        max(col("pk")).as("p_keep"))
      .withColumn("acceptance", col("n_kept") / col("n_docs").cast("double"))
      .select(col("lang"), col("n_docs"), col("n_kept"), col("p_keep"), col("acceptance"))
      .orderBy("lang")
  }

  /** Gopher repetition-filter thresholds (Rae et al. 2021 §A1.1, adapted
    * to the fixture's token streams — the corpus has no line structure). */
  val GopherTopTokMax = 0.2
  val GopherTopBigramMax = 0.2

  /** Gopher-style repetition filters: per doc, the fraction of tokens
    * taken by the most frequent token and the fraction of token
    * positions covered by the most frequent word-2-gram (2·count/n —
    * may exceed 1 on degenerate repeats); keep = both under threshold.
    * Two explode+max aggregations keyed on doc — linear scans at any
    * corpus size. */
  def q_llm_gopher_repetition(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("toks"))
      .withColumn("nt", size(col("toks")).cast("bigint"))
    val uni = docs.select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("c1"))
    val big = docs.filter(col("nt") >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(toks) - 1), i -> concat(toks[i-1], ' ', toks[i]))")).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("c2"))
    val tokFrac = coalesce(col("c1"), lit(0L)).cast("double") / col("nt")
    val bigFrac = coalesce(col("c2"), lit(0L)).cast("double") * 2 / col("nt")
    docs.select(col("doc_id"), col("lang"), col("nt"))
      .join(uni, Seq("doc_id"), "left_outer")
      .join(big, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("lang"), col("nt").as("n_tokens"),
        round(tokFrac, 6).as("top_tok_frac"),
        round(bigFrac, 6).as("top_bigram_frac"),
        (tokFrac <= GopherTopTokMax && bigFrac <= GopherTopBigramMax).as("keep"))
      .orderBy("doc_id")
  }

  /** Deterministic doc sample for per-doc term scoring outputs. */
  val TfidfSampleMod = 25

  /** TF-IDF keyword extraction: per-lang document frequencies, top-3
    * terms per sampled doc by tf·ln(N/df). Ranking uses the ROUNDED
    * score (+ term tie-break) so the order is reproducible across
    * engines. df table broadcasts; one explode + two keyed aggs. */
  def q_llm_tfidf(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val tok = docs.select(col("doc_id"), col("lang"),
      explode(split(col("text"), " ")).as("tok"))
    val nd = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val df = tok.select(col("lang"), col("tok"), col("doc_id")).distinct()
      .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("df"))
    val tf = tok.filter(col("doc_id") % TfidfSampleMod === 0)
      .groupBy(col("doc_id"), col("lang"), col("tok")).agg(count(lit(1)).as("tf"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("tok").asc)
    tf.join(broadcast(df), Seq("lang", "tok"))
      .join(broadcast(nd), Seq("lang"))
      .withColumn("tfidf",
        round(col("tf") * log(col("n").cast("double") / col("df")), 6))
      .withColumn("rk", row_number().over(w).cast("bigint"))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("lang"), col("tok").as("term"),
        col("tf"), col("tfidf"), col("rk"))
      .orderBy("doc_id", "rk")
  }

  /** BM25 parameters (Robertson et al., Okapi). */
  val Bm25K1 = 1.2
  val Bm25B = 0.75

  /** BM25 retrieval scoring: the query is the corpus's 3 highest-df
    * tokens (deterministic), every doc is scored with the Lucene-form
    * idf ln((N−df+.5)/(df+.5)+1) and length normalization against the
    * global mean doc length; top-10 docs by rounded score. Query terms
    * + df broadcast; the scan stays one explode + keyed agg. */
  def q_llm_bm25(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val tok = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val nTot = docs.agg(count(lit(1)).as("n_total"))
    val dl = docs.select(col("doc_id"), col("lang"),
      size(split(col("text"), " ")).cast("double").as("dl"))
    val avgdl = dl.agg(avg(col("dl")).as("avgdl"))
    val df = tok.distinct().groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val q = df.orderBy(col("df").desc, col("tok").asc).limit(3)
    val tf = tok.join(broadcast(q), Seq("tok"))
      .groupBy(col("doc_id"), col("tok"), col("df")).agg(count(lit(1)).as("tf"))
    val score = tf
      .crossJoin(broadcast(nTot)).crossJoin(broadcast(avgdl))
      .join(dl, Seq("doc_id"))
      .withColumn("idf", log((col("n_total") - col("df") + 0.5) / (col("df") + 0.5) + 1))
      // term scores as 1e9-scaled BIGINTs, summed exactly (order-blind;
      // absorbs the cross-engine LN last-ulp — the scaled product form,
      // measured zero-divergence across engines)
      .withColumn("term_score",
        col("idf") * col("tf") * (Bm25K1 + 1) /
          (col("tf") + (col("dl") / col("avgdl") * Bm25B + (1 - Bm25B)) * Bm25K1))
      .groupBy(col("doc_id"), col("lang"))
      // 6-dp output from the exact integer sum (true-tie-safe rounding)
      .agg((round(sum(Dsl.rlong(col("term_score") * 1e9)).cast("double") / 1000, 0)
        / 1e6).as("bm25"))
    score.orderBy(col("bm25").desc, col("doc_id").asc).limit(10)
      .select(col("doc_id"), col("lang"), col("bm25"))
  }

  /** Symmetric int8 quantization of the embedding table (the compression
    * pass before ANN serving): per vector, scale = max|x|/127,
    * q = ⌊x/scale + ½⌋ (floor form — identical rounding in both
    * engines), reporting reconstruction error stats. One explode + two
    * keyed aggs; scales broadcast back. */
  def q_llm_quantize(s: SparkSession, dir: String): DataFrame = {
    val el = Tables.embeddings(s, dir)
      .select(col("vec_id"), explode(col("embedding")).as("xf"))
      .select(col("vec_id"), col("xf").cast("double").as("x"))
    val sc = el.groupBy(col("vec_id")).agg((max(abs(col("x"))) / 127).as("scale"))
    val e = col("x") - floor(col("x") / nullif(col("scale"), lit(0d)) + 0.5) * col("scale")
    el.join(broadcast(sc), Seq("vec_id"))
      .select(col("vec_id"), col("scale"), e.as("e"))
      .groupBy(col("vec_id"), col("scale"))
      .agg(round(max(abs(col("e"))), 6).as("max_err"),
        round(avg(col("e") * col("e")), 6).as("mse"))
      .select(col("vec_id"), round(col("scale"), 6).as("scale"),
        col("max_err"), col("mse"))
      .orderBy("vec_id")
  }

  /** BPE-style pair statistics (Sennrich et al. 2016 §3.2, the counting
    * step of the first merge): corpus-wide adjacent character-pair
    * frequencies inside tokens, top-20. The whole op is explode +
    * count — the shape of one vocab-learner iteration at corpus scale. */
  def q_llm_bpe_pairs(s: SparkSession, dir: String): DataFrame =
    Tables.spread(s, Tables.documents(s, dir))
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))")).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair").asc)
      .limit(20)

  /** URL/source-level dedup (the crawl-dedup pass that precedes content
    * dedup): per (lang, source) keep the smallest doc_id, count the
    * removals. One keyed aggregation. */
  def q_llm_source_dedup(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(col("lang"), col("source"))
      .agg(min(col("doc_id")).as("kept_doc"),
        (count(lit(1)) - 1).as("n_removed"))
      .orderBy("lang", "source")

  /** DSIR data selection (Xie et al. 2023 "Data Selection for Language
    * Models via Importance Resampling"): hashed-unigram importance
    * weights of every doc against a target domain (here: the `en`
    * slice). Tokens hash into 1024 buckets (md5 60-bit family — the
    * cross-engine-reproducible hash used by q_llm_minhash_md5); bucket
    * unigram models with add-1 smoothing are fit for target and raw
    * corpus, and a doc's log importance weight is
    * Σ_tok [ln p_target(b(tok)) − ln p_raw(b(tok))]. Per-bucket log
    * ratios round to 9 decimals pre-sum (ln's last ulp differs across
    * engines, like exp — see q_gnn_temporal_decay), doc and lang stats
    * round to 6 post-agg (D5).
    *
    * Scale shape: the two 1024-row bucket models are tiny aggregates
    * that broadcast back onto the token stream; the only full shuffle is
    * the per-doc sum — DSIR's pass structure at 100 TB. */
  def q_llm_dsir(s: SparkSession, dir: String): DataFrame = {
    val B = 1024
    val toks = Tables.spread(s, Tables.documents(s, dir))
      .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("tok"))
      .select(col("doc_id"), col("lang"),
        pmod(Dsl.md5Hash60(col("tok")), lit(B.toLong)).as("b"))
      // 3 consumers (raw model, target model, per-doc weight pass):
      // materialize the tokenize + md5-bucket scan once instead of
      // re-running it per consumer (r17 opt) — at scale, one pass +
      // spillable checkpoint blocks beats three corpus scans.
      .ckpt("dsirToks")
    val raw = toks.groupBy(col("b").as("rb")).agg(count(lit(1)).as("rcnt"))
    val tgt = toks.filter(col("lang") === "en")
      .groupBy(col("b").as("tb")).agg(count(lit(1)).as("tcnt"))
    // Totals come from the 1024-row bucket models, NOT from re-counting
    // the token stream: Catalyst does no cross-branch CSE, so a
    // toks.agg(count) here would re-run the whole tokenize+hash scan —
    // two redundant full-corpus passes at the 100 TB target.
    val rTot = raw.agg(sum(col("rcnt")).as("r_total"))
    val tTot = tgt.agg(sum(col("tcnt")).as("t_total"))
    val lr = raw
      .join(tgt, col("rb") === col("tb"), "left_outer")
      .crossJoin(broadcast(rTot)).crossJoin(broadcast(tTot))
      .select(col("rb"),
        round(
          log((coalesce(col("tcnt"), lit(0L)) + 1).cast("double") / (col("t_total") + B)) -
          log((col("rcnt") + 1).cast("double") / (col("r_total") + B)), 9).as("lr"))
    val docW = toks.join(broadcast(lr), col("b") === col("rb"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("lr")).as("logw"))
    docW.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("logw")), 6).as("avg_logw"),
        round(max(round(col("logw"), 6)), 6).as("max_logw"))
      .orderBy("lang")
  }

  /** Sliding-window document chunking (the splitter a pre-training or
    * retrieval pipeline runs before embedding/packing): 64-token chunks
    * with 16-token overlap — chunk starts at 1, 49, 97, … (stride 48),
    * the final chunk absorbs the tail (a doc shorter than one chunk is a
    * single chunk). Per-lang chunk/token accounting incl. the overlap
    * (re-tokenized) volume. Linear scan + explode, no shuffle beyond the
    * per-lang aggregation. */
  def q_llm_chunk_overlap(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .select(col("lang"), col("doc_id"), nTokens.as("n"))
    val chunks = d
      .select(col("lang"), col("doc_id"), col("n"),
        explode(sequence(lit(1L), greatest(col("n") - 16, lit(1L)), lit(48L))).as("cs"))
      .withColumn("clen", least(lit(64L), col("n") - col("cs") + 1))
    val agg = chunks.groupBy(col("lang"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_chunks"),
        sum(col("clen")).as("chunk_tokens"),
        round(avg(col("clen")), 6).as("avg_chunk_len"))
    val tot = d.groupBy(col("lang").as("lang_t")).agg(sum(col("n")).as("total"))
    agg.join(tot, col("lang") === col("lang_t"))
      .select(col("lang"), col("n_docs"), col("n_chunks"), col("chunk_tokens"),
        (col("chunk_tokens") - col("total")).as("overlap_tokens"),
        col("avg_chunk_len"))
      .orderBy("lang")
  }

  /** End-to-end curation DAG — the composition proof that the operator
    * library chains the way a real pipeline uses it, in ONE declarative
    * query Catalyst plans as a whole: language select (en) → length
    * filter (≥ 30 tokens) → exact-dedup keep-first (md5(text), smallest
    * doc_id wins) → greedy 2048-token sequence packing of the
    * survivors → per-pack accounting. Every stage is the already-tested
    * operator's exact formula; the oracle mirrors the same CTE chain.
    * Scale shape: linear scans + one hash-dedup shuffle + the packer's
    * per-lang sort — no stage materializes between steps. */
  def q_llm_pipeline_e2e(s: SparkSession, dir: String): DataFrame = {
    val wDedup = Window.partitionBy(col("th")).orderBy(col("doc_id"))
    val kept = Tables.documents(s, dir)
      .filter(col("lang") === "en")
      .select(col("doc_id"), nTokens.as("nt"), md5(col("text")).as("th"))
      .filter(col("nt") >= 30)
      .withColumn("rn", row_number().over(wDedup))
      .filter(col("rn") === 1)
    // The packer's single-stream cumulative sum is the SEMANTIC — one
    // global pack sequence over the selected language, ordered by
    // doc_id, so packs are reproducible shard-independently. r13: the
    // global-window form became the Dist prefix device (range-partition
    // on doc_id + broadcast offsets) — same global order, same packs,
    // no single-partition sort over the dedup survivors (which GROW
    // with the corpus even at a fixed language share).
    val (packed, _, _) = Dist.orderedPrefix(kept, Seq(col("doc_id")),
      "_pack_rn", Some((col("nt"), "cum_incl")))
    packed
      .withColumn("cum_before", col("cum_incl") - col("nt"))
      .drop("_pack_rn", "cum_incl")
      .withColumn("pack_id", expr(s"cum_before div $PackLen"))
      .groupBy(col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("pack_tokens"),
        min(col("doc_id")).as("first_doc"))
      .orderBy("pack_id")
  }

  /** T5-style span-corruption mask accounting (Raffel et al. 2020
    * §3.1.4 — the denoising-objective prep step between packing and
    * tokenization; round 7): deterministic md5-seeded span starts
    * (position starts a 3-token span iff md5("span:doc:pos") % 20 = 0 →
    * ~15% corruption rate), overlapping spans merge (gaps-and-islands),
    * one sentinel per merged span. Per-lang accounting: docs, tokens,
    * masked tokens, sentinels, mask ratio and mean merged-span length
    * (two exact-integer divisions). Masking is position-based — the
    * token text never leaves the scan. Determinism: hash rule integer,
    * mask/sentinel via windows on ONE (doc_id, pos) partitioning; no
    * float before the two final divisions. Linear in corpus tokens. */
  def q_llm_span_corruption(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select(col("doc_id"), col("lang"),
      size(split(col("text"), " ")).cast("bigint").as("n"))
    val pos = d.select(col("doc_id"), col("lang"), col("n"),
      explode(expr("sequence(1L, n)")).as("pos"))
    val st = pos.withColumn("start",
      when(Dsl.md5Hash60(concat(lit("span:"), col("doc_id").cast("string"),
        lit(":"), col("pos").cast("string"))) % 20 === 0, 1L).otherwise(0L))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val masked = st
      .withColumn("m", max(col("start")).over(w.rowsBetween(-2, 0)))
      .withColumn("sent",
        when(col("m") === 1 && coalesce(lag(col("m"), 1).over(w), lit(0L)) === 0, 1L)
          .otherwise(0L))
    masked.groupBy(col("lang"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_tokens"),
        sum(col("m")).as("n_masked"),
        sum(col("sent")).as("n_sentinels"))
      .select(col("lang"), col("n_docs"), col("n_tokens"), col("n_masked"),
        col("n_sentinels"),
        (col("n_masked").cast("double") / col("n_tokens").cast("double"))
          .as("mask_ratio"),
        when(col("n_sentinels") > 0,
          col("n_masked").cast("double") / col("n_sentinels").cast("double"))
          .otherwise(lit(0.0)).as("mean_span_len"))
      .orderBy("lang")
  }

  /** Curriculum data ordering (round 10 — the easy→hard schedule of
    * curriculum learning, Bengio et al. 2009, applied per lang as a
    * length curriculum): within each lang, docs rank by (n_chars,
    * doc_id), split into 4 exact-integer quartile buckets
    * (bucket = 4·(rank−1) div n), and the training schedule interleaves
    * buckets round-robin — position = 4·(rank_in_bucket − 1) + bucket
    * + 1 — so every phase of training sees a difficulty mix while the
    * within-bucket order stays easy→hard. Output: per-bucket accounting
    * (doc count, char range, first/last schedule position, and an exact
    * Σ doc_id·pos checksum that pins the entire schedule). Two keyed
    * windows per lang — no global sort at any scale; at 100 TB the
    * schedule materializes as a sort WITHIN shard files. */
  def q_llm_curriculum_order(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select(col("doc_id"), col("lang"), col("n_chars"))
    val wRank = Window.partitionBy(col("lang"))
      .orderBy(col("n_chars").asc, col("doc_id").asc)
    val ranked = d.withColumn("rnk", row_number().over(wRank).cast("bigint"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("lang"))))
      .withColumn("bucket", expr("(4 * (rnk - 1)) div n"))
    val wBucket = Window.partitionBy(col("lang"), col("bucket"))
      .orderBy(col("rnk").asc)
    ranked
      .withColumn("rib", row_number().over(wBucket).cast("bigint"))
      .withColumn("pos", lit(4L) * (col("rib") - 1L) + col("bucket") + 1L)
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("min_chars"), max(col("n_chars")).as("max_chars"),
        min(col("pos")).as("first_pos"), max(col("pos")).as("last_pos"),
        sum(col("doc_id") * col("pos")).as("schedule_checksum"))
      .orderBy("lang", "bucket")
  }

  /** Dataset card / datasheet summary per source (round 10 — the
    * per-provenance report a curation run ships with the corpus,
    * Gebru et al. 2021 "Datasheets for Datasets"): doc count, distinct
    * languages, exact char mass, char range, mean doc length, and each
    * source's share of the corpus. ONE keyed aggregation + a broadcast
    * 1-row total — source-cardinality output at any corpus size. */
  def q_llm_dataset_card(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val tot = d.agg(count(lit(1)).as("tot"))
    d.groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("n_chars")).as("tot_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_langs"), col("tot_chars"),
        col("min_chars"), col("max_chars"),
        round(col("tot_chars").cast("double") / col("n_docs").cast("double"), 6)
          .as("mean_chars"),
        round(col("n_docs").cast("double") / col("tot").cast("double"), 6)
          .as("doc_share"))
      .orderBy("source")
  }

  /** Cross-source lexical overlap matrix (round 10 — the provenance
    * question every multi-source corpus audit asks: how much does
    * source X share with source Y?): each source reduces to its
    * DISTINCT word-trigram vocabulary, then source pairs (sa < sb)
    * score shared-trigram count and trigram Jaccard. This is the
    * shingle-level generalization of exact-hash overlap (which the
    * synthetic fixture only exhibits at sf0.1 — 8 cross-source twins);
    * trigram overlap is non-degenerate at every scale and is what a
    * real audit uses to flag scraped-from-the-same-site sources before
    * the dedup tier runs. Shapes: the trigram join's per-key fan-out is
    * source-cardinality-bounded (≤ |sources|²/2 pairs per trigram,
    * never doc-bounded); output is source-pair-sized. */
  def q_llm_source_overlap(s: SparkSession, dir: String): DataFrame = {
    // widen the 1-split fixture scan for the trigram kernel (Tables.spread)
    val tri = Tables.spread(s, Tables.documents(s, dir))
      .select(col("source"), expr("filter(split(text, ' '), t -> t <> '')").as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("source"), explode(expr(
        "transform(sequence(0, size(t) - 3), i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))"))
        .as("g"))
      .distinct()
      // 3 consumers (totals + both self-join legs): materialize the
      // tokenize+explode+distinct chain once (r17 opt)
      .ckpt("srcOverlapTri")
    val tot = tri.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val a = tri.select(col("g"), col("source").as("src_a"))
    val b = tri.select(col("g").as("gb"), col("source").as("src_b"))
    a.join(b, col("g") === col("gb") && col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(tot.select(col("source").as("ta"), col("n").as("na"))),
        col("src_a") === col("ta"))
      .join(broadcast(tot.select(col("source").as("tb"), col("n").as("nb"))),
        col("src_b") === col("tb"))
      .select(col("src_a"), col("src_b"), col("n_shared"),
        round(col("n_shared").cast("double")
          / (col("na") + col("nb") - col("n_shared")).cast("double"), 6)
          .as("trigram_jaccard"))
      .orderBy("src_a", "src_b")
  }

  /** DP release ε (Laplace scale = sensitivity/ε = 1/ε for counts). */
  val DpEpsilon = 1.0

  /** Differentially-private count release, calibration view (round 10 —
    * the privacy mechanism a data pipeline applies before publishing
    * corpus statistics; Dwork et al. 2006): per event_type, the true
    * count (sensitivity 1) plus Laplace(1/ε) noise drawn DETERMINISTICALLY
    * via inverse-CDF over an md5-seeded uniform — u = h/2⁶⁰ (an exact
    * power-of-two division), noise = −(1/ε)·sign(u−½)·ln(1−2|u−½|) —
    * so the release is reproducible across retries and engines (the
    * seeded-regularizer device; a production release swaps the seed
    * source for a DRBG and DROPS the true column — this is the
    * calibration view that validates the mechanism). ln round-9, noise
    * round-6; one keyed count. */
  def q_llm_dp_counts(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.events(s, dir).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_true"))
    val u = Dsl.md5Hash60(concat(lit("dp:"), col("event_type")))
      .cast("double") / lit(1152921504606846976.0) // 2^60
    val half = abs(u - lit(0.5))
    // round-9 pins the one libm ln before any further arithmetic (the
    // entropy device), so the sign flip and sum below are exact
    val mag = (lit(-1.0) / lit(DpEpsilon)) *
      round(log(lit(1.0) - lit(2.0) * half), 9)
    val noise = round(when(u < 0.5, -mag).otherwise(mag), 6)
    c.select(col("event_type"), col("n_true"), lit(DpEpsilon).as("epsilon"),
        noise.as("noise"),
        round(col("n_true") + noise, 6).as("n_released"))
      .orderBy("event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_llm_dp_counts" -> q_llm_dp_counts _,
    "q_llm_source_overlap" -> q_llm_source_overlap _,
    "q_llm_dataset_card" -> q_llm_dataset_card _,
    "q_llm_curriculum_order" -> q_llm_curriculum_order _,
    "q_llm_span_corruption" -> q_llm_span_corruption _,
    "q_llm_pipeline_e2e" -> q_llm_pipeline_e2e _,
    "q_llm_chunk_overlap" -> q_llm_chunk_overlap _,
    "q_llm_dsir" -> q_llm_dsir _,
    "q_llm_gopher_repetition" -> q_llm_gopher_repetition _,
    "q_llm_tfidf" -> q_llm_tfidf _,
    "q_llm_bm25" -> q_llm_bm25 _,
    "q_llm_quantize" -> q_llm_quantize _,
    "q_llm_bpe_pairs" -> q_llm_bpe_pairs _,
    "q_llm_source_dedup" -> q_llm_source_dedup _,
    "q_llm_pack_sequences" -> q_llm_pack_sequences _,
    "q_llm_contamination" -> q_llm_contamination _,
    "q_llm_pii_redact" -> q_llm_pii_redact _,
    "q_llm_sample_stratified" -> q_llm_sample_stratified _,
    "q_text_normalize" -> q_text_normalize _,
    "q_llm_domain_mix" -> q_llm_domain_mix _,
    "q_llm_rejection_sample" -> q_llm_rejection_sample _
  )
}
