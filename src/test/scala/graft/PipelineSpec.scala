package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{PipelineOps, Tables}

/** Invariant tests for the training-data pipeline operators (§2.12);
  * exact values are covered by the DuckDB oracle gate. */
class PipelineSpec extends AnyFunSuite {
  import TestSpark._

  test("sequence packing conserves tokens and respects pack capacity") {
    val s = spark
    val packs = PipelineOps.q_llm_pack_sequences(s, sf0001).collect()
    val corpus = Tables.documents(s, sf0001)
      .agg(sum(size(split(col("text"), " ")))).collect()(0).getLong(0)
    assert(packs.map(_.getLong(3)).sum == corpus, "every token lands in exactly one pack")
    // pack_ids are dense per lang starting at 0
    packs.groupBy(_.getString(0)).foreach { case (lang, rows) =>
      val ids = rows.map(_.getLong(1)).sorted
      assert(ids.head == 0L && ids.last == ids.length - 1L, s"dense pack ids for $lang")
    }
  }

  test("contamination is bounded by the test split") {
    val rows = PipelineOps.q_llm_contamination(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= 0L && r.getLong(2) <= r.getLong(1),
        s"n_contam within [0, n_test] for ${r.getString(0)}")
    }
  }

  test("pii redaction accounting is internally consistent") {
    val rows = PipelineOps.q_llm_pii_redact(spark, sf0001).collect()
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "docs_with_hits <= n_docs")
      assert(r.getLong(3) >= r.getLong(2), "total_hits >= docs_with_hits")
    }
  }

  test("stratified sample takes every 10th doc per stratum") {
    val rows = PipelineOps.q_llm_sample_stratified(spark, sf0001).collect()
    rows.foreach { r =>
      val (total, sampled) = (r.getLong(2), r.getLong(3))
      assert(sampled == (total + 9) / 10, s"ceil(total/10) sampled in stratum $r")
    }
  }

  test("normalization never increases distinct count") {
    val rows = PipelineOps.q_text_normalize(spark, sf0001).collect()
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), "distinct normalized <= distinct raw")
      assert(r.getLong(2) <= r.getLong(1), "distinct raw <= docs")
    }
  }

  test("domain mix weights invert the shares") {
    val rows = PipelineOps.q_llm_domain_mix(spark, sf0001).collect()
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-5, "shares sum to 1")
    rows.foreach { r =>
      // weight ~ 0.2/share (rounding at 6dp on both factors)
      assert(math.abs(r.getDouble(3) * r.getDouble(2) - 0.2) < 1e-4,
        s"weight*share ~ target for ${r.getString(0)}")
    }
  }
}
