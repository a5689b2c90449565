package graft.engine

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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_llm_pack_sequences" -> q_llm_pack_sequences _,
    "q_llm_contamination" -> q_llm_contamination _,
    "q_llm_pii_redact" -> q_llm_pii_redact _,
    "q_llm_sample_stratified" -> q_llm_sample_stratified _,
    "q_text_normalize" -> q_text_normalize _,
    "q_llm_domain_mix" -> q_llm_domain_mix _
  )
}
