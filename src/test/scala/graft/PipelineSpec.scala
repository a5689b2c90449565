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

  /** Temp docs table with controlled texts (one lang/source). */
  private def docsDir(texts: Seq[String]): String = {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pipe_docs").toString
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("gopher repetition metrics on known texts") {
    val dir = docsDir(Seq(
      "a a a b",          // c1=3 -> .75; "a a" x2 -> 2*2/4 = 1.0 -> drop
      "w x y z"))         // all distinct: .25, bigrams unique: .5 -> drop (bigram > .2)
    val rows = PipelineOps.q_llm_gopher_repetition(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(3), r.getDouble(4), r.getBoolean(5)))).toMap
    assert(rows(0L) == ((0.75, 1.0, false)))
    assert(rows(1L) == ((0.25, 0.5, false)))
  }

  test("bpe pair counts on known tokens") {
    val dir = docsDir(Seq("abab cd", "abc"))
    // pairs: abab -> ab, ba, ab; cd -> cd; abc -> ab, bc
    val got = PipelineOps.q_llm_bpe_pairs(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("ab" -> 3L, "ba" -> 1L, "cd" -> 1L, "bc" -> 1L))
  }

  test("tfidf ranks are dense 1..3 and scores non-negative") {
    val rows = PipelineOps.q_llm_tfidf(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (doc, rs) =>
      assert(rs.map(_.getLong(5)).sorted.toSeq == (1L to rs.length).toSeq,
        s"dense ranks for doc $doc")
    }
    // idf = ln(N/df) >= 0 since df <= N, so tf*idf >= 0
    rows.foreach(r => assert(r.getDouble(4) >= 0.0))
  }

  test("bm25 rewards higher query-term frequency at equal doc length") {
    val dir = docsDir(Seq(
      "q q q pad",   // 3 query-term hits
      "q r s pad",   // 1 hit, same length
      "q q t pad"))  // 2 hits
    // query = top-3 df tokens = {pad(3), q(3), r(1)} (df desc, token asc)
    val got = PipelineOps.q_llm_bm25(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // more q-occurrences at equal length -> higher score (docs 0 vs 2)
    assert(got(0L) > got(2L), s"tf monotonicity: $got")
    // doc 1 alone matches the rare query term r -> its idf dominates
    assert(got(1L) > got(0L), s"rare-term idf dominance: $got")
  }

  test("quantization error is bounded by half a step") {
    val rows = PipelineOps.q_llm_quantize(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (scale, maxErr, mse) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(scale > 0.0)
      // both sides are 6dp-rounded -> allow one rounding step of slack
      assert(maxErr <= scale / 2 + 1e-6, s"max_err $maxErr <= scale/2 ${scale / 2}")
      assert(mse <= maxErr * maxErr + 1e-6)
    }
  }

  test("source dedup keeps the smallest doc id per (lang, source)") {
    val s = spark
    val rows = PipelineOps.q_llm_source_dedup(s, sf0001).collect()
    val total = Tables.documents(s, sf0001).count()
    assert(rows.map(r => r.getLong(3) + 1).sum == total, "kept+removed covers the corpus")
    val mins = Tables.documents(s, sf0001)
      .groupBy(col("lang"), col("source")).agg(min(col("doc_id")).as("m"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    rows.foreach(r =>
      assert(r.getLong(2) == mins((r.getString(0), r.getString(1)))))
  }
}
