package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{LlmOps, Multimodal, Relational, StreamingOps, Tables, TextOps}

/** Invariant tests for the round-4 continuation operators. As with
  * Round4Spec, cross-engine values are pinned by the DuckDB oracle gate;
  * these pin the semantics a hash-compare would not explain. */
class Round5Spec extends AnyFunSuite {
  import TestSpark._

  test("histogram: partitions the table exactly, buckets within [0,20)") {
    val rows = Relational.q_agg_histogram(spark, sf0001).collect()
    val nOrders = Tables.orders(spark, sf0001).count()
    assert(rows.map(_.getLong(1)).sum == nOrders,
      "histogram bucket counts must partition the table")
    assert(rows.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 20))
    val totalCents = Tables.orders(spark, sf0001)
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")))
      .collect()(0).getLong(0)
    assert(rows.map(_.getLong(2)).sum == totalCents,
      "per-bucket cent totals must sum to the table total")
    assert(rows.forall(r => r.getDouble(3) <= r.getDouble(4)))
  }

  test("range frame: trailing-30-day totals equal a brute-force recompute") {
    val out = Relational.q_win_range_frame(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(3), r.getLong(4)))
      .toMap
    val orders = Tables.orders(spark, sf0001)
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate"), lit("1992-01-01").cast("date")).as("dayno"),
        col("o_totalprice"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val byCust = orders.groupBy(_._1)
    orders.take(500).foreach { case (ck, ok, dayno, _) =>
      val window = byCust(ck).filter(o => o._3 >= dayno - 30 && o._3 <= dayno)
      val expTotal = window.map(o => BigDecimal(o._4).setScale(2)).sum.toDouble
      val (gotTotal, gotN) = out((ck, ok))
      assert(gotN == window.length, s"frame row count for ($ck,$ok)")
      assert(math.abs(gotTotal - expTotal) < 1e-6, s"frame total for ($ck,$ok)")
    }
  }

  test("bucketed band join equals the naive |Δt| ≤ δ join") {
    val bucketed = Relational.q_join_range_bucket(spark, sf0001).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val ev = Tables.events(spark, sf0001)
    val err = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("e_id"), unix_micros(col("ts")).as("e_us"))
    val naive = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("ts").as("p_ts"),
        unix_micros(col("ts")).as("p_us"))
      .join(err, abs(col("p_us") - col("e_us")) <= 600L * 1000000L)
      .groupBy(to_date(col("p_ts")).as("day"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("p_id")).as("n_purchases"),
        countDistinct(col("e_id")).as("n_errors"))
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(bucketed == naive,
      "bucketing must be result-invisible vs the naive band join")
  }

  test("bloom prefilter: candidates are a superset of exact hits; hits equal plain semi-join") {
    val out = LlmOps.q_llm_bloom_prefilter(spark, sf0001).collect()
    out.foreach { r =>
      assert(r.getLong(1) >= r.getLong(3), s"cand docs >= hit docs in ${r.getString(0)}")
      assert(r.getLong(2) >= r.getLong(4), s"cand grams >= hit grams in ${r.getString(0)}")
    }
    // exact hits must equal a bloom-free 5-gram intersection
    def grams(heldOut: Boolean) = Tables.documents(spark, sf0001)
      .filter(if (heldOut) col("doc_id") % 10 === 0 else col("doc_id") % 10 =!= 0)
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 5)
      .select(col("doc_id"), col("lang"), explode(expr(
        "array_distinct(transform(sequence(1, size(toks) - 4)," +
          " i -> array_join(slice(toks, i, 5), ' ')))")).as("g"))
    val plain = grams(heldOut = false)
      .join(grams(heldOut = true).select(col("g").as("hg")).distinct(),
        col("g") === col("hg"), "left_semi")
      .groupBy("lang")
      .agg(countDistinct("doc_id").as("d"), countDistinct("g").as("h"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    out.filter(_.getLong(3) > 0).foreach { r =>
      assert(plain(r.getString(0)) == (r.getLong(3), r.getLong(4)),
        s"exact hit counts for ${r.getString(0)}")
    }
  }

  test("quality classifier: keep counts bounded, mean inside [min, max]") {
    val rows = TextOps.q_llm_quality_classifier(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "n_keep <= n_docs")
      assert(r.getDouble(3) >= r.getDouble(4) - 1e-9 &&
        r.getDouble(3) <= r.getDouble(5) + 1e-9, "avg_z within [min_z, max_z]")
    }
  }

  test("pq ann: the query vector itself ranks first with zero ADC distance") {
    val rows = LlmOps.q_llm_ann_pq(spark, sf0001).collect()
    assert(rows.length == 10)
    // vec 0 is both the query and centroid 0 of every subspace, so its
    // codes are exact and its asymmetric distance is exactly 0
    assert(rows.head.getLong(0) == 0L && rows.head.getDouble(1) == 0.0,
      "query vector must self-retrieve at distance 0")
    val d = rows.map(_.getDouble(1))
    assert(d.forall(_ >= 0.0) && d.sameElements(d.sorted),
      "ADC distances must be non-negative and ascending")
  }

  test("bigram xent: bigram counts match the token stream; scores positive") {
    val out = TextOps.q_text_bigram_xent(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val expected = Tables.documents(spark, sf0001)
      .filter(col("doc_id") % 10 === 0)
      .select(col("lang"), (size(split(col("text"), " ")) - 1).as("nb"))
      .filter(col("nb") >= 1)
      .groupBy("lang").agg(count(lit(1)).as("nd"), sum(col("nb")).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    expected.foreach { case (lang, (nd, nb)) =>
      val (gotNd, gotNb, xent) = out(lang)
      assert(gotNd == nd && gotNb == nb, s"doc/bigram counts for $lang")
      assert(xent > 0.0, s"cross-entropy must be positive for $lang")
    }
  }

  test("mm resize halves the decoded dimensions (floor, min 1) per media") {
    val s = spark
    import s.implicits._
    val dec = Multimodal.decoded(s, sf0001).collect()
      .map(d => d.media_id -> d).toMap
    val res = Multimodal.decoded(s, sf0001)
      .mapPartitions(Multimodal.resizeStub).collect()
    assert(res.nonEmpty)
    res.foreach { r =>
      val d = dec(r.media_id)
      assert(r.width == math.max(d.width / 2, 1) &&
        r.height == math.max(d.height / 2, 1), s"resize of media ${r.media_id}")
    }
  }

  test("mm features: byte volume matches decode; mean byte is a valid ASCII value") {
    val feat = Multimodal.q_mm_features(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getDouble(3), r.getInt(4))).toMap
    val dec = Multimodal.q_mm_decode(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    dec.foreach { case (kind, bytes) =>
      val (gotBytes, meanByte, alphabet) = feat(kind)
      assert(gotBytes == bytes, s"byte volume for $kind")
      assert(meanByte > 0.0 && meanByte < 128.0, "ASCII payload mean")
      assert(alphabet > 0 && alphabet <= 128, "ASCII alphabet size")
    }
  }

  test("cdc latest snapshot on a stream (complete mode) equals batch; upserts win") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    def ts(d: Int, h: Int) = Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
    val early = Seq(
      R5E(1, 1, ts(1, 1), "click", 10.0), R5E(2, 2, ts(1, 2), "view", 1.0))
    val late = Seq(
      R5E(3, 1, ts(2, 5), "purchase", 99.0), // upserts user 1
      R5E(4, 3, ts(1, 9), "signup", 0.0))
    val ms = MemoryStream[R5E]
    val q = StreamingOps.cdcLatest(ms.toDF())
      .writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("cdc5").start()
    ms.addData(early: _*); q.processAllAvailable()
    ms.addData(late: _*); q.processAllAvailable(); q.stop()
    val streamed = s.table("cdc5").orderBy("user_id").collect().toSeq
    val batch = StreamingOps.cdcLatest((early ++ late).toDF())
      .orderBy("user_id").collect().toSeq
    assert(streamed == batch, "incremental snapshot must equal batch")
    val u1 = streamed.find(_.getLong(0) == 1L).get
    assert(u1.getLong(2) == 3L && u1.getString(3) == "purchase",
      "later event must upsert user 1's snapshot row")
  }
}

case class R5E(event_id: Long, user_id: Long, ts: Timestamp, event_type: String, value: Double)
