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
    * the same parquet tables — EVERY key has an entry (356 as of round
    * 14; zero self-checked rows remain). The
    * approximate tier (q_agg_approx_distinct, q_agg_approx_percentile,
    * and since round 14 the xxhash64-family q_llm_minhash_lsh /
    * q_llm_simhash audits) is bracket-oracled: exact columns (md5-twin
    * and ground-truth pair counts) hash-checked, within-measured-
    * envelope booleans asserted TRUE (envelopes in APPROX_BOUNDS.json,
    * floors/bands documented at the LlmOps constants). */
  def oracleSql: Map[String, String] =
    Oracle.all
}
