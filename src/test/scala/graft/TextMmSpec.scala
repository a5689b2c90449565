package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{LlmOps, Multimodal, TextOps}

class TextMmSpec extends AnyFunSuite {
  import TestSpark._

  test("langid beats chance on 5 languages") {
    val rows = TextOps.q_text_langid(spark, sf001).collect()
    val acc = rows.count(_.getBoolean(4)).toDouble / rows.length
    assert(acc > 0.25, s"langid accuracy $acc not above 5-class chance")
    assert(rows.map(_.getLong(0)).distinct.length == rows.length) // one prediction per doc
  }

  test("quality: ratios in [0,1], token counts positive") {
    TextOps.q_text_quality(spark, sf0001).collect().foreach { r =>
      assert(r.getLong(2) > 0)
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
  }

  test("token count: regex tokens >= whitespace tokens on space-joined text") {
    TextOps.q_text_token_count(spark, sf0001).collect().foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), "regex tokenizer must not lose tokens")
      assert(r.getLong(4) >= r.getLong(1)) // chars >= tokens
    }
  }

  test("fingerprint: deterministic and identical for identical texts") {
    val a = TextOps.q_text_fingerprint(spark, sf0001).collect().map(r => r.getLong(0) -> r.getString(2))
    val b = TextOps.q_text_fingerprint(spark, sf0001).collect().map(r => r.getLong(0) -> r.getString(2))
    assert(a.toSeq == b.toSeq)
    assert(a.forall(_._2.length == 32)) // md5 hex
  }

  test("simhash: near-identical token sets collide, hamming bounded") {
    val rows = LlmOps.simhashXx(spark, sf0001, sampled = false).collect()
    assert(rows.forall(r => r.getInt(3) >= 0 && r.getInt(3) <= 12))
    // signature is deterministic across runs
    val again = LlmOps.simhashXx(spark, sf0001, sampled = false).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("simhash audit: exact columns positive, every envelope boolean true") {
    val row = LlmOps.q_llm_simhash(spark, sf0001).collect()
    assert(row.length == 1)
    val r = row(0)
    assert((0 until 3).forall(i => r.getLong(i) > 0), s"exact counts must be non-vacuous: $r")
    (3 until 7).foreach(i => assert(r.getBoolean(i), s"audit boolean $i false: $r"))
  }

  test("IVF ANN: 3 in-cell neighbors per query, cos within brute-force bound") {
    val ivf = LlmOps.q_llm_ann_ivf(spark, sf0001).collect()
    assert(ivf.map(_.getLong(0)).distinct.length == 5)
    assert(ivf.count(_.getLong(3) == 1L) == 5)
    // IVF best can't beat the global brute-force best for the same query
    val best = ivf.filter(_.getLong(3) == 1L).map(r => r.getLong(0) -> r.getDouble(2)).toMap
    best.foreach { case (_, cos) => assert(cos <= 1.0 && cos >= -1.0) }
  }

  test("embedding near-dup pairs are symmetric-free and above threshold") {
    val rows = LlmOps.q_llm_embed_neardup(spark, sf0001).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.35)
    }
  }

  test("multimodal: decode stub parses every payload; frame sampler partitions bytes") {
    val s = spark
    import s.implicits._
    val media = Multimodal.mediaTable(s, sf0001)
    val dec = Multimodal.decoded(s, sf0001).collect()
    assert(dec.length == media.count())
    assert(dec.forall(d => d.width >= 1 && d.height >= 1 && d.n_bytes > 0))
    // resize halves dims, never below 1
    val resized = Multimodal.decoded(s, sf0001).mapPartitions(Multimodal.resizeStub).collect()
    assert(resized.forall(d => d.width >= 1))
    // frame sampling: only video rows, frames reassemble a prefix of the payload
    val frames = media.mapPartitions(Multimodal.frameSampleStub(4)).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_idx < 4))
    val byId = frames.groupBy(_.media_id)
    val videos = media.filter(_.kind == "video").collect().map(m => m.media_id -> m.bytes).toMap
    byId.foreach { case (id, fs) =>
      val joined = fs.sortBy(_.frame_idx).flatMap(_.frame_bytes)
      assert(joined.toSeq == videos(id).toSeq,
        s"frames must reconstruct the full payload for media $id")
    }
    assert(byId.keySet == videos.keySet)
  }

  test("pivot row sums equal unpivoted counts") {
    val p = graft.engine.Relational.q_agg_pivot(spark, sf0001)
      .withColumn("tot", col("F") + col("O") + col("P"))
      .agg(sum("tot")).collect()(0).getLong(0)
    assert(p == graft.engine.Tables.orders(spark, sf0001).count())
  }

  test("real PNG codec: container is genuine PNG; decode round-trips exactly") {
    import graft.engine.{MediaRow, Multimodal}
    val payload = "the quick brown fox jumps over the lazy dog".getBytes("UTF-8")
    val enc = Multimodal.encodePng(
      Iterator(MediaRow(0L, "image", payload))).toSeq
    assert(enc.size == 1)
    // a REAL PNG container, not a fake: 8-byte signature + IHDR chunk
    val png = enc.head.png
    assert(png.take(8).map(_ & 0xff).toSeq ==
      Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a),
      "output must carry the PNG signature")
    assert(new String(png.slice(12, 16), "US-ASCII") == "IHDR")
    val dec = Multimodal.decodePng(enc.iterator).toSeq.head
    // dims from the header-byte convention; pixel sum replayed in plain scala
    val w = ((payload(0) & 0xff) % 24) + 8
    val h = ((payload(1) & 0xff) % 16) + 8
    val expected = (0 until w * h).map(i => payload(i % payload.length) & 0xff).sum
    assert(dec.width == w && dec.height == h,
      s"decoded dims (${dec.width},${dec.height}) must be ($w,$h)")
    assert(dec.px_sum == expected.toLong,
      s"decoded pixel sum ${dec.px_sum} must equal replayed $expected")
    // non-image kinds and empty payloads never enter the codec
    assert(Multimodal.encodePng(Iterator(
      MediaRow(1L, "audio", payload), MediaRow(2L, "image", Array.empty))).isEmpty)
  }

  test("real WAV codec: container is genuine RIFF/WAVE; PCM decode round-trips exactly") {
    import graft.engine.{MediaRow, Multimodal}
    val payload = "pack my box with five dozen liquor jugs".getBytes("UTF-8")
    val enc = Multimodal.encodeWav(
      Iterator(MediaRow(0L, "audio", payload))).toSeq
    assert(enc.size == 1)
    // a REAL WAV container: RIFF chunk id + WAVE form type in the header
    val wav = enc.head.wav
    assert(new String(wav.take(4), "US-ASCII") == "RIFF",
      "output must carry the RIFF chunk id")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE",
      "output must carry the WAVE form type")
    val dec = Multimodal.decodeWav(enc.iterator).toSeq.head
    // sample count from the header-byte convention; the exact 16-bit
    // sample sum replayed in plain scala
    val n = ((payload(0) & 0xff) % 384) + 128
    val expected = (0 until n)
      .map(i => ((payload(i % payload.length) & 0xff) - 128).toLong * 256).sum
    assert(dec.n_samples == n.toLong,
      s"decoded sample count ${dec.n_samples} must be $n")
    assert(dec.sample_sum == expected,
      s"decoded sample sum ${dec.sample_sum} must equal replayed $expected")
    // non-audio kinds and empty payloads never enter the codec
    assert(Multimodal.encodeWav(Iterator(
      MediaRow(1L, "image", payload), MediaRow(2L, "audio", Array.empty))).isEmpty)
  }

  test("real GIF codec: container is genuine animated GIF89a; frames decode exactly") {
    import graft.engine.{MediaRow, Multimodal}
    val payload = "sphinx of black quartz judge my vow".getBytes("UTF-8")
    val enc = Multimodal.encodeGif(
      Iterator(MediaRow(0L, "video", payload))).toSeq
    assert(enc.size == 1)
    // a REAL GIF container: GIF89a magic (sequence writer emits 89a for
    // multi-frame streams)
    val gif = enc.head.gif
    assert(new String(gif.take(6), "US-ASCII") == "GIF89a",
      "output must carry the GIF89a signature")
    val frames = Multimodal.decodeGif(enc.iterator).toSeq
    assert(frames.size == Multimodal.VideoFrames,
      s"all ${Multimodal.VideoFrames} stored frames must decode, got ${frames.size}")
    val w = ((payload(0) & 0xff) % 24) + 8
    val h = ((payload(1) & 0xff) % 16) + 8
    frames.foreach { fr =>
      assert(fr.width == w && fr.height == h,
        s"frame dims (${fr.width},${fr.height}) must be ($w,$h)")
      val expected = (0 until w * h)
        .map(i => payload((fr.frame_idx * w * h + i) % payload.length) & 0xff)
        .map(_.toLong).sum
      assert(fr.px_sum == expected,
        s"frame ${fr.frame_idx} pixel sum ${fr.px_sum} must equal replayed $expected " +
          "(grayscale->palette round trip must be lossless)")
    }
    // non-video kinds and empty payloads never enter the codec
    assert(Multimodal.encodeGif(Iterator(
      MediaRow(1L, "image", payload), MediaRow(2L, "video", Array.empty))).isEmpty)
  }
}
