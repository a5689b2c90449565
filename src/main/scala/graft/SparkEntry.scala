package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.engine.{BpeOps, ClusterOps, CurationOps, Gnn, GraphOps, LlmOps, Multimodal, Oracle, PartitionOps, PipelineOps, RankOps, Relational, SketchOps, Skew, SourceOps, StatsOps, StreamingGnn, StreamingOps, TextOps, TrainOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query surface: SURVEY.md §2 (normative contract reconstructed from the
  * reference's declared scope, /root/reference/README.md:1-2).
  */
object SparkEntry {
  /** Flagship query (TPC-H Q1 analog) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q_agg_pricing_summary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ StreamingOps.queries ++ GraphOps.queries ++
      Gnn.queries ++ LlmOps.queries ++ TextOps.queries ++ Multimodal.queries ++
      StreamingGnn.queries ++ PipelineOps.queries ++ Skew.queries ++
      SourceOps.queries ++ SketchOps.queries ++ ClusterOps.queries ++
      BpeOps.queries ++ PartitionOps.queries ++ TrainOps.queries ++
      CurationOps.queries ++ StatsOps.queries ++ RankOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables — EVERY key has an entry. The approximate
    * tier (q_agg_approx_distinct, q_agg_approx_percentile, and the
    * xxhash64-family q_llm_minhash_lsh / q_llm_simhash audits) is
    * bracket-oracled: the EXACT columns (md5-twin and ground-truth pair
    * counts) are hash-checked by DuckDB, while the xx-side quality
    * columns are ENGINE-EVALUATED envelope checks the oracle pins to
    * literal TRUE — the oracle does not independently replay
    * recall/precision for the engine-specific hash family; it acts as a
    * tripwire on booleans the engine computes against measured
    * envelopes (APPROX_BOUNDS.json; floors/bands at the LlmOps
    * constants; Round15Spec proves each boolean can flip). Since r15
    * the minhash precision boolean additionally re-verifies a sampled
    * pair set through an independent formula path (bitmask vs
    * token-array Jaccard). */
  def oracleSql: Map[String, String] =
    Oracle.all
}
