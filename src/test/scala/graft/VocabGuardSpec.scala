package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.LlmOps

/** Regression test for the bitmap-path staleness guard: the vocab<=64
  * probe is memoized per (session, dir), so if data under dir changes
  * in-session and the vocabulary outgrows 64 bits, mask construction
  * must FAIL LOUDLY (raise_error on vid >= 64) instead of silently
  * wrapping shiftleft mod 64 and corrupting every set operation. */
class VocabGuardSpec extends AnyFunSuite {
  import TestSpark._

  private def writeDocs(dir: String, texts: Seq[String]): Unit = {
    val s = spark
    import s.implicits._
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("stale vocab<=64 memo fails loudly instead of wrapping masks") {
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("graft_vocab").toString
    // 1) small vocabulary: probe memoizes "fits in 64 bits", masks work
    writeDocs(dir, Seq("a b c d", "a b c e", "x y z"))
    val small = LlmOps.q_llm_jaccard_pairs(s, dir).collect()
    assert(small.nonEmpty, "near-dup pair expected in the small corpus")
    // 2) same dir, vocabulary grows past 64 mid-session: the memo is now
    //    stale and the guard must raise, not return wrong Jaccards
    writeDocs(dir, (0 until 80).map(i => s"tok$i tok${(i + 1) % 80} filler$i"))
    val e = intercept[Exception] {
      LlmOps.q_llm_jaccard_pairs(s, dir).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("vocab grew past 64 bits")),
      s"expected the loud vocab guard, got: ${messages(e).mkString(" | ")}")
  }

  test("jaccard exact-baseline fence refuses a lang past the doc bound") {
    // r13 guard: the O(n²/lang) exact baseline must refuse to run when
    // the largest language exceeds JaccardExactMaxDocsPerLang, steering
    // callers to the LSH scale path instead of melting a cluster.
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("graft_fence").toString
    writeDocs(dir,
      (0 until (LlmOps.JaccardExactMaxDocsPerLang.toInt + 1)).map(i => s"w$i"))
    val e = intercept[IllegalArgumentException] {
      LlmOps.q_llm_jaccard_pairs(s, dir)
    }
    assert(e.getMessage.contains("q_llm_minhash_lsh"),
      s"fence must point to the scale path, got: ${e.getMessage}")
    // and on the fixture the guard headroom is emitted, exercised, positive
    val m = LlmOps.q_llm_jaccard_pairs(s, sf0001)
      .select(col("exact_guard_margin")).limit(1).collect()
    assert(m.nonEmpty && m(0).getLong(0) > 0, "fixture must sit under the fence")
    // the oracle SQL hardcodes the fence literal (plain strings) — pin
    // the constant so the two can never drift apart silently
    assert(LlmOps.JaccardExactMaxDocsPerLang == 20000L,
      "changing the fence requires updating the 20000 literals in Oracle.scala")
  }
}
