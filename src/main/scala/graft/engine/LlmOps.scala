package graft.engine

import graft.engine.Ckpt.CkptOps

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LLM-training-data pipeline operators (SURVEY.md §2.11; driver north
  * star BASELINE.json:6 — dedup, similarity search, multimodal columns,
  * text analysis). All set math runs through codegen'd built-ins /
  * higher-order functions — no Scala UDFs in the hot path.
  *
  * Scale notes per op are inline; the common theme: exact O(n²) variants
  * are bounded by an equi-key (lang) or a tiny query side, and each has
  * a sub-quadratic scale path (MinHashLSH) in the same file.
  */
object LlmOps {

  /** Native codegen'd f64 dot product over float vectors
    * (graft.functions.FloatVecDot) — registered per session, bit-identical
    * to the zip_with+aggregate HOF formulation it replaced but runs as a
    * tight generated loop instead of a lambda per element. */
  private[graft] def vecDot(s: SparkSession)(a: Column, b: Column): Column = {
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_vec_dot", exprs => graft.functions.FloatVecDot(exprs(0), exprs(1)),
      "built-in")
    call_function("graft_vec_dot", a, b)
  }

  private def cosSim(s: SparkSession)(a: Column, b: Column): Column = {
    val dot = vecDot(s) _
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Cosine from a precomputed-norm pair: one dot per pair instead of
    * three (norms are computed once per vector BEFORE the pair join). */
  private def cosSimPre(s: SparkSession)(a: Column, b: Column, na: Column, nb: Column): Column =
    vecDot(s)(a, b) / (na * nb)

  /** Per-vector L2 norm column (same sqrt∘dot the pairwise formula used,
    * so cosines stay bit-identical). */
  private def normCol(s: SparkSession)(v: Column): Column = sqrt(vecDot(s)(v, v))

  /** Token sets per doc (dedup convention: whitespace split, distinct). */
  private def tokenSets(s: SparkSession, dir: String): DataFrame =
    Tables.spread(s, Tables.documents(s, dir))
      .select(col("doc_id"), col("lang"),
        array_distinct(split(col("text"), " ")).as("toks"))

  // ── dedup ────────────────────────────────────────────────────────────

  /** Duplication-count histogram (the dedup REPORT a curation run
    * ships: how much of the corpus is k-times duplicated): exact
    * content-hash group sizes → histogram of copy counts with doc and
    * distinct-content mass per bucket, plus each bucket's share of all
    * docs. Two keyed counts — the linear dedup shape; the histogram is
    * copy-count-bounded at any scale. */
  def q_llm_dup_histogram(s: SparkSession, dir: String): DataFrame = {
    val sizes = Tables.documents(s, dir)
      .select(md5(col("text").cast("binary")).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("copies"))
    val tot = sizes.agg(sum(col("copies")).as("n_total"))
    sizes.groupBy(col("copies"))
      .agg(count(lit(1)).as("n_contents"),
        sum(col("copies")).as("n_docs"))
      .crossJoin(broadcast(tot))
      .select(col("copies"), col("n_contents"), col("n_docs"),
        round(col("n_docs").cast("double") / col("n_total").cast("double"), 6)
          .as("doc_share"))
      .orderBy("copies")
  }

  /** Exact dedup accounting: per-lang doc count vs distinct content
    * hashes. Hash-groupBy scales linearly (shuffle on md5 prefix). */
  def q_llm_dedup_exact(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("lang"), md5(col("text").cast("binary")).as("h"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("h")).as("n_distinct"))
      .orderBy("lang")

  /** Exact near-dup: same-lang pairs with token-set Jaccard ≥ 0.5.
    * O(n²) per lang — correct baseline; the scale path is
    * q_llm_minhash_lsh which prunes candidates first. */
  /** Adaptive dictionary+bitmap encoding of token sets (one scalar stats
    * probe, AQE-style): when the global vocabulary fits in 64 bits, each
    * token set becomes a bigint mask, so pairwise set math collapses to
    * `bit_count(ma & mb)` — a bitmap-index join. Returns None for open
    * vocabularies (callers keep the array path). Identical results either
    * way. */
  /** Memo for the vocabulary-size stats probe: one count per (session,
    * dir), not one per calling query (jaccard + minhash would otherwise
    * each rescan the corpus just to learn the answer). */
  private val vocabFitsCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), java.lang.Boolean]()

  /** BEST-EFFORT freshness token for dir's documents table: file count
    * + max modification time + total byte size from ONE driver-side
    * metadata listing. Folded into EVERY corpus-derived cache key via
    * `docsKey` (r16; r15 covered only the vocab probe and the mask MV),
    * a mid-session rewrite of the corpus becomes a cache MISS — fresh
    * probe, fresh build — instead of a stale read. The staleness
    * failure mode this targets: a memoized verdict/MV surviving a data
    * change would silently wrap mask bits (pre-r14) or serve stale
    * checkpoints into fresh joins (unknown doc_ids dropping through
    * inner joins — ADVICE r15). Best-effort, not categorical: a
    * same-second rewrite that keeps both the part-file count AND the
    * total byte count defeats the token on coarse-mtime filesystems;
    * the raise_error CASE in the mask build remains the hard backstop.
    * A missing path yields a sentinel token so the consumer's table
    * read raises the friendlier data-source error instead of this
    * metadata probe. */
  private def docsFreshness(s: SparkSession, dir: String): String =
    tableFreshness(s, dir, "documents")

  private[graft] def tableFreshness(s: SparkSession, dir: String,
      table: String): String = try {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$table.parquet")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val st = fs.listStatus(p)
    s"${st.length}:${st.map(_.getModificationTime).foldLeft(0L)(math.max)}:" +
      s"${st.map(_.getLen).sum}"
  } catch { case _: java.io.FileNotFoundException => "absent" }

  /** Latest observed freshness token per (application, dir) — the
    * generation register behind `docsKey`'s eviction of superseded
    * builds. */
  private val docsGenCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  /** Freshness-scoped cache-key suffix for EVERY corpus-derived memo
    * (MV keys and driver-side probe maps alike): `dir|fresh`. On a
    * freshness MISS (the corpus under `dir` was rewritten in-session)
    * the SUPERSEDED generation's entries are evicted before the new
    * token is returned — Mv entries matching the old `dir|fresh`
    * suffix have their checkpoint blocks unpersisted synchronously, and
    * the stale probe-map rows are dropped — so repeated rewrites cannot
    * grow executor storage unboundedly, and no consumer can ever join a
    * FRESH mask table against a STALE signature/pair MV (ADVICE r15:
    * mixed-generation joins silently dropped unknown doc_ids through
    * inner joins). */
  private[graft] def docsKey(s: SparkSession, dir: String): String = {
    val fresh = docsFreshness(s, dir)
    val appId = s.sparkContext.applicationId
    val prev = docsGenCache.put((appId, dir), fresh)
    if (prev != null && prev != fresh) {
      val stale = s"|$dir|$prev"
      Mv.keys(s).filter(_.endsWith(stale)).foreach(Mv.evict(s, _))
      vocabFitsCache.remove((appId, s"$dir|$prev"))
      docCountCache.remove((appId, s"$dir|$prev"))
    }
    s"$dir|$fresh"
  }

  /** Latest observed freshness token per (application, dir, table-set)
    * — the generation register behind `tablesKey`. */
  private val tableGenCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  /** Freshness-scoped cache-key suffix for MVs derived from an
    * ARBITRARY table set — the docsKey device generalized (r17, ADVICE
    * r16: the r16 freshness keying covered only documents-derived MVs;
    * graph/embedding MVs stayed keyed by dir alone, so a mid-session
    * rewrite of orders/lineitem/embeddings could still serve stale
    * adjacency or centroid MVs into fresh joins). Same
    * superseded-generation eviction: on a freshness miss every Mv
    * entry of the old generation is unpersisted synchronously before
    * the new token is returned. Key shape `dir|fresh` keeps the
    * eviction suffix-match shared with docsKey. */
  private[graft] def tablesKey(s: SparkSession, dir: String,
      tables: Seq[String]): String = {
    val fresh = tables.map(t => tableFreshness(s, dir, t)).mkString("+")
    val appId = s.sparkContext.applicationId
    val prev = tableGenCache.put((appId, s"$dir|${tables.mkString(",")}"), fresh)
    if (prev != null && prev != fresh) {
      val stale = s"|$dir|$prev"
      Mv.keys(s).filter(_.endsWith(stale)).foreach(Mv.evict(s, _))
    }
    s"$dir|$fresh"
  }

  private[graft] def tokenMasks(s: SparkSession, dir: String): Option[DataFrame] = {
    val dk = docsKey(s, dir)
    val fits = vocabFitsCache.computeIfAbsent(
      (s.sparkContext.applicationId, dk), _ =>
        tokenSets(s, dir).select(explode(col("toks")).as("vtok"))
          .distinct().count() <= 64)
    if (!fits) None
    // Session MV (r15 perf recovery): the mask table is the shared
    // working set of the whole dedup/audit tier — jaccard_pairs,
    // minhash_lsh, simhash, minhash_est and the dedup-cluster family
    // each verified candidates against it, and every call re-ran the
    // token explode + vid join + groupBy over the corpus. One build per
    // (session, fixture); consumers scan a doc-count-sized checkpoint.
    else Some(Mv.memo(s, s"tokenMasks|$dk") { bs =>
      val d = tokenSets(bs, dir)
      val vocab = d.select(explode(col("toks")).as("vtok")).distinct()
      // vocab ≤ 64 rows (guarded above): collect the SORTED vocabulary
      // and ship literal ids — a bounded driver-side table. This
      // replaces the former `row_number().over(Window.orderBy(vtok))`,
      // which was the last unpartitioned window left in the dedup
      // tier's plans (it was bounded, but every consumer needed a
      // plan-gate allowlist entry; a 64-row collect needs none).
      import bs.implicits._
      val vids = vocab.orderBy(col("vtok")).collect().map(_.getString(0))
        .zipWithIndex.toSeq.toDF("vtok", "vid")
      d.select(col("doc_id"), col("lang"), explode(col("toks")).as("tok"))
        .join(broadcast(vids), col("tok") === col("vtok"))
        .groupBy(col("doc_id"), col("lang"))
        // Fail LOUDLY if the memoized vocab<=64 probe went stale (data
        // changed under dir in-session): a vid>=64 would silently wrap
        // shiftleft mod 64 and corrupt every downstream set operation.
        .agg(bit_or(expr(
          """case when vid < 64 then shiftleft(1L, vid)
             else cast(raise_error(concat('graft: vocab grew past 64 bits mid-session, vid=',
                                          cast(vid as string))) as bigint) end"""))
          .as("mask"), count(lit(1)).as("nt"))
        .ckpt("tokenMasks")
    })
  }

  /** Memoized one-scalar document-count probe (the vertexCount /
    * vocabFits device): gates the mask-table broadcast below. */
  private val docCountCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), java.lang.Long]()

  private[graft] def docCount(s: SparkSession, dir: String): Long =
    docCountCache.computeIfAbsent(
      (s.sparkContext.applicationId, docsKey(s, dir)),
      _ => Tables.documents(s, dir).count())

  /** Probe-gated broadcast hint for the doc-count-sized mask/set tables
    * (the GraphOps.stateHint pattern): below the shared
    * `spark.graft.stateBroadcastMaxRows` guard the per-doc table
    * broadcasts onto the candidate-pair stream — the pair stream (the
    * big side) never moves for the verify joins; past the guard the
    * hint drops and AQE plans the shuffle join. */
  private def docHint(s: SparkSession, dir: String, df: DataFrame): DataFrame =
    if (docCount(s, dir) <= s.conf.get("spark.graft.stateBroadcastMaxRows",
        GraphOps.StateBroadcastMaxRows.toString).toLong) broadcast(df)
    else df

  /** Shared exact-Jaccard verification: given candidate (lang, doc_a,
    * doc_b) rows, attach set representations (bitmask when the vocab
    * fits, token arrays otherwise) and compute `jac` — the ONE place the
    * ic/jac formula lives for both the exact and the LSH path. */
  private[graft] def jaccardVerify(s: SparkSession, dir: String, pairs: DataFrame): DataFrame =
    tokenMasks(s, dir) match {
      case Some(masks) =>
        pairs
          .join(docHint(s, dir,
              masks.select(col("doc_id").as("id_a"), col("mask").as("ma"), col("nt").as("na"))),
            col("doc_a") === col("id_a"))
          .join(docHint(s, dir,
              masks.select(col("doc_id").as("id_b"), col("mask").as("mb"), col("nt").as("nb"))),
            col("doc_b") === col("id_b"))
          .withColumn("ic", expr("bit_count(ma & mb)").cast("double"))
          .withColumn("jac", col("ic") / (col("na") + col("nb") - col("ic")))
      case None => jaccardViaArrays(s, dir, pairs)
    }

  /** The token-ARRAY branch of the Jaccard formula (array_intersect on
    * the raw token sets) — the fallback for open vocabularies, and the
    * INDEPENDENT recompute path the minhash audit samples against the
    * bitmask branch (ADVICE r14: a quality boolean must not re-check
    * the engine's own filter on its own output). */
  private[graft] def jaccardViaArrays(s: SparkSession, dir: String, pairs: DataFrame): DataFrame = {
    val d = tokenSets(s, dir)
    pairs
      .join(docHint(s, dir, d.select(col("doc_id").as("id_a"), col("toks").as("ta"))),
        col("doc_a") === col("id_a"))
      .join(docHint(s, dir, d.select(col("doc_id").as("id_b"), col("toks").as("tb"))),
        col("doc_b") === col("id_b"))
      .withColumn("ic", size(array_intersect(col("ta"), col("tb"))).cast("double"))
      .withColumn("jac", col("ic") / (size(col("ta")) + size(col("tb")) - col("ic")))
  }

  /** Exact-baseline fence (C4-threshold precedent: a named constant the
    * SURVEY row documents): q_llm_jaccard_pairs refuses to run when the
    * largest language holds more docs than this — its O(n²/lang) pair
    * space is the EXACT ground-truth baseline, never the scale path.
    * 20k docs/lang ≈ 2·10⁸ raw pairs in the worst language: feasible as
    * a single-cluster verification pass, an order below cluster-killing.
    * The per-run headroom is emitted as `exact_guard_margin` so the
    * guard is exercised (non-vacuous) on every fixture run. */
  val JaccardExactMaxDocsPerLang = 20000L

  def q_llm_jaccard_pairs(s: SparkSession, dir: String): DataFrame = {
    // EXACT BASELINE — not the scale path. O(n²/lang) by design: this is
    // the oracle-checkable ground truth the banded-LSH production path
    // (q_llm_minhash_lsh / q_llm_minhash_md5) is tested against. Do NOT
    // scale its input up; at corpus scale run the LSH twin (PERF.md
    // "exact-baseline fences").
    val maxPerLang = Tables.documents(s, dir)
      .groupBy(col("lang")).agg(count(lit(1)).as("c"))
      .agg(max(col("c"))).collect()(0).getLong(0) // lang-bounded agg, 1-row collect
    require(maxPerLang <= JaccardExactMaxDocsPerLang,
      s"q_llm_jaccard_pairs is the O(n^2/lang) exact baseline: largest lang has " +
        s"$maxPerLang docs > fence $JaccardExactMaxDocsPerLang. Run the LSH scale " +
        s"path (q_llm_minhash_lsh) instead.")
    // Slim all-pairs generation (ids + set sizes only), then the shared
    // jaccardVerify attaches set representations — one formula location
    // for both this exact path and the LSH candidate path.
    val sizes = tokenMasks(s, dir) match {
      case Some(masks) => masks.select(col("doc_id"), col("lang"), col("nt"))
      case None => tokenSets(s, dir)
        .select(col("doc_id"), col("lang"), size(col("toks")).cast("bigint").as("nt"))
    }
    val a = sizes.select(col("lang"), col("doc_id").as("doc_a"), col("nt").as("pna"))
    val b = sizes.select(col("lang").as("lang_b"), col("doc_id").as("doc_b"), col("nt").as("pnb"))
    val pairs = a.join(b, col("lang") === col("lang_b") && col("doc_a") < col("doc_b") &&
        // exact-preserving prune: J >= 0.5 forces |A| <= 2|B| and |B| <= 2|A|
        col("pna") <= col("pnb") * 2 && col("pnb") <= col("pna") * 2)
      .select(col("lang"), col("doc_a"), col("doc_b"))
    jaccardVerify(s, dir, pairs)
      .filter(col("jac") >= 0.5)
      .select(col("lang"), col("doc_a"), col("doc_b"), round(col("jac"), 6).as("jaccard"),
        (lit(JaccardExactMaxDocsPerLang) - lit(maxPerLang)).as("exact_guard_margin"))
      .orderBy("lang", "doc_a", "doc_b")
  }

  /** Banded MinHash LSH near-dup detection (Broder 1997; Indyk–Motwani
    * 1998), implemented natively in codegen'd column expressions:
    * 8 seeded xxhash64 min-hashes per token set → 4 bands × 2 rows
    * (collision threshold (1/b)^(1/r) = 0.5) → same-lang bucket join on
    * band hash → dedup candidates → EXACT Jaccard verify ≥ 0.5.
    *
    * This replaces MLlib's MinHashLSH.approxSimilarityJoin, whose
    * per-candidate distance on 2^18-dim sparse vectors is orders slower
    * than array_intersect on the raw token sets (it ran 7+ min at sf0.1).
    * At 100 TB the bucket join is the scale path: candidates are
    * O(Σ bucket²), never all n² pairs, and the signature pass is one
    * linear scan. */
  /** Full-corpus 8-component xx MinHash signature table, memoized per
    * (session, fixture) — one-pass native signature
    * (graft.functions.MinHashSig): identical values to
    * array_min(transform(toks, t -> xxhash64(lit(j), t))) per j,
    * without 8 interpreted lambda passes over every token array. The
    * audit's full and sampled legs both read this one build (the
    * sampled leg is a filter of it). */
  private[graft] def minhashXxSig(s: SparkSession, dir: String): DataFrame =
    Mv.memo(s, s"minhashXxSig|${docsKey(s, dir)}") { bs =>
      bs.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_minhash_sig",
        exprs => graft.functions.MinHashSig(exprs.head, 8),
        "built-in")
      tokenSets(bs, dir).filter(size(col("toks")) > 0)
        .withColumn("sig", call_function("graft_minhash_sig", col("toks")))
        .select(col("doc_id"), col("lang"), col("sig"))
        .ckpt("minhashXxSig")
    }

  /** The FULL-corpus verified xx near-dup pair table is a session MV
    * (r16): it is THE artifact a dedup deployment persists per corpus
    * snapshot (the pairs ARE the dedup output), and two consumers read
    * it per session — the q_llm_minhash_lsh audit and ApproxBounds'
    * md5-twin envelope measurement. The sample-bounded 10% leg stays
    * live (cheap, and the audit's independent-recompute leg must not
    * share a materialization with the thing it re-scores). */
  private[graft] def minhashXxPairs(s: SparkSession, dir: String,
      sampled: Boolean = false): DataFrame =
    if (sampled) minhashXxPairsLive(s, dir, sampled = true)
    else Mv.memo(s, s"minhashXxPairs|${docsKey(s, dir)}")(bs =>
      minhashXxPairsLive(bs, dir, sampled = false).ckpt("minhashXxPairs"))

  private def minhashXxPairsLive(s: SparkSession, dir: String,
      sampled: Boolean): DataFrame = {
    val numBands = 4
    val rowsPerBand = 2
    // sampled = the deterministic 10% doc tier the md5 twin runs on —
    // the audit's independent-recompute leg (sample-bounded at any sf)
    val sig0 = minhashXxSig(s, dir)
    val sig = if (sampled) sig0.filter(col("doc_id") % 10 === 0) else sig0
    // Slim bucket join: only (lang, band, hash, doc_id) rows cross the
    // shuffle; token arrays are joined back AFTER candidate dedup so each
    // candidate pair materializes its sets exactly once.
    val banded = sig.select(col("lang"), col("doc_id"),
        posexplode(array((0 until numBands).map { b =>
          xxhash64(lit(1000 + b),
            element_at(col("sig"), b * rowsPerBand + 1),
            element_at(col("sig"), b * rowsPerBand + 2))
        }: _*)).as(Seq("band_id", "band_hash")))
    val a = banded.select(col("lang"), col("band_id"), col("band_hash"),
      col("doc_id").as("doc_a"))
    val b = banded.select(col("lang").as("lang_b"), col("band_id").as("bid_b"),
      col("band_hash").as("bh_b"), col("doc_id").as("doc_b"))
    val pairs = a.join(b, col("lang") === col("lang_b") && col("band_id") === col("bid_b") &&
        col("band_hash") === col("bh_b") && col("doc_a") < col("doc_b"))
      .select(col("lang"), col("doc_a"), col("doc_b"))
      .distinct()
    jaccardVerify(s, dir, pairs)
      .filter(col("jac") >= 0.5)
      .select(col("lang"), col("doc_a"), col("doc_b"), round(col("jac"), 6).as("jaccard"))
    // no ORDER BY: this is a private pipeline — its consumers (the
    // audit's aggregates, set-compare specs, ApproxBounds) are
    // order-blind, and a global sort of the ~2M-pair set was pure
    // wasted work on the audit path (r15)
  }

  /** Measured cross-hash-family envelopes for the xx-banding audit
    * (round-14 bracket oracle; the r19 sketch-tier device). Measured at
    * sf0.001 / sf0.01 / sf0.1 (Scratch14 sweep, archived in
    * APPROX_BOUNDS.json `minhash_lsh.md5_twin_*`):
    * recall of the full-corpus xx pass over the oracled md5 twin's
    * verified pairs = 0.9195 / 0.9212 / 0.8583 (all pairs) and
    * 1.0 / 1.0 / 0.9816 (strong, J ≥ 0.8 — banding catch probability
    * 1-(1-J²)⁴ ≥ 0.983 per pair). Round-15 tightening (VERDICT r14
    * item 4 — the old 0.75/0.9 floors carried a full band of slack):
    * the all-pairs check is a TWO-sided band [0.84, 0.98] sitting just
    * outside the measured [0.8583, 0.9212] range — a recall JUMP past
    * the band is as much a drift as a collapse (operating point no
    * longer matches the 4×2 designation, the simhash-band precedent) —
    * and the strong floor moves to 0.95, just under the weakest
    * measured strong point (0.9816). Data + hash families are
    * deterministic, so a boolean flip means the pipeline drifted, not
    * noise; Round15Spec proves each boolean CAN fail by feeding the
    * audit a deliberately perturbed pair set. */
  val MinhashTwinRecallAllBand: (Double, Double) = (0.84, 0.98)
  val MinhashTwinRecallStrongLo = 0.95

  /** MinHash-LSH dedup AUDIT (round 14; r15 precision leg): the
    * full-corpus xx-family banding pipeline (`minhashXxPairs`) scored
    * against the md5-family twin's verified pairs — the one output a
    * curation deployment actually gates on before trusting an
    * engine-specific hash family at 100 TB. Exact columns (the md5
    * twin's pair counts) hash-match the DuckDB replay; the xx-side
    * quality lands as within-envelope booleans the oracle asserts TRUE
    * (bracket oracle, sketch-tier precedent): recall over twin pairs
    * inside the measured bands, and precision re-verified through an
    * INDEPENDENT formula path (ADVICE r14: the old min(jac) >= 0.5
    * column re-checked the pipeline's own filter on its own output —
    * vacuous): the sampled xx pipeline's emitted pairs are re-scored
    * via the token-ARRAY Jaccard branch (`jaccardViaArrays`) and
    * precision_ok requires every recomputed jac to match the bitmask
    * branch's value AND clear the 0.5 threshold. Scale shape: both
    * sides are banded bucket joins; the scoring joins are
    * pair-set-sized; the recompute leg is sample-bounded. */
  def q_llm_minhash_lsh(s: SparkSession, dir: String): DataFrame =
    minhashAudit(s, dir,
      minhashXxPairs(s, dir).select(col("doc_a"), col("doc_b"), col("jaccard")),
      minhashXxPairs(s, dir, sampled = true))

  /** Audit body, parameterized over the two xx legs so Round15Spec can
    * feed PERTURBED pair sets and prove the envelope booleans flip
    * (a bracket oracle whose booleans cannot fail certifies nothing). */
  private[graft] def minhashAudit(s: SparkSession, dir: String,
      xx: DataFrame, xxSample: DataFrame): DataFrame = {
    // ONE pass over the xx pair set (the 100 TB-shaped bucket-join
    // output, ~2M rows at sf0.1 — never materialized): the md5 twin is
    // sample-bounded (21k rows at sf0.1), so it BROADCASTS onto the xx
    // stream and every audit aggregate — xx count, verify floor, twin
    // hits — falls out of a single map-side join + global agg. xx pairs
    // are distinct by construction (bucket dedup + verify), so each
    // matched twin pair counts exactly once.
    val md5 = minhashMd5Pairs(s, dir) // memoized checkpoint-backed twin
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    val mdAgg = md5.agg(
      count(lit(1)).as("n_md5_pairs"),
      coalesce(sum(when(col("jaccard") >= 0.8, 1L)), lit(0L)).as("n_md5_strong"))
    val oneScan = xx.join(
        broadcast(md5.select(col("doc_a"), col("doc_b"),
          (col("jaccard") >= 0.8).as("m_strong"), lit(true).as("m_hit"))),
        Seq("doc_a", "doc_b"), "left_outer")
      .agg(count(lit(1)).as("n_xx"), min(col("jaccard")).as("min_jac"),
        coalesce(sum(when(col("m_hit"), 1L)), lit(0L)).as("n_hit_all"),
        coalesce(sum(when(col("m_strong"), 1L)), lit(0L)).as("n_hit_strong"))
    // Independent precision leg: the 10%-sample xx pipeline's emitted
    // pairs re-scored through the token-ARRAY branch. A masks/arrays
    // disagreement OR a recomputed jac below the 0.5 operating point
    // fails precision_ok.
    val samp = jaccardViaArrays(s, dir,
        xxSample.select(col("doc_a"), col("doc_b"), col("jaccard").as("jac_masks")))
      .agg(count(lit(1)).as("n_samp"),
        coalesce(sum(when(round(col("jac"), 6) =!= col("jac_masks")
          || col("jac") < 0.5, 1L).otherwise(0L)), lit(0L)).as("n_samp_bad"))
    val recallAll = col("n_hit_all").cast("double") / col("n_md5_pairs").cast("double")
    mdAgg.crossJoin(oneScan).crossJoin(samp).select(
      col("n_md5_pairs"), col("n_md5_strong"),
      (col("n_md5_strong") === 0 ||
        col("n_hit_strong").cast("double") >=
          lit(MinhashTwinRecallStrongLo) * col("n_md5_strong").cast("double"))
        .as("recall_strong_ok"),
      (col("n_md5_pairs") === 0 ||
        (recallAll >= MinhashTwinRecallAllBand._1 &&
          recallAll <= MinhashTwinRecallAllBand._2))
        .as("recall_all_ok"),
      ((col("n_xx") === 0 || col("min_jac") >= 0.5) &&
        col("n_samp_bad") === 0).as("precision_ok"),
      (col("n_xx") > 0 && col("n_samp") > 0).as("xx_nonempty"))
  }

  /** Cross-engine-verifiable MinHash LSH on the deterministic 10% sample
    * (doc_id % 10 = 0): the SAME banding scheme as q_llm_minhash_lsh but
    * with an md5-derived hash family (first 15 hex chars = 60 bits,
    * decoded with conv/CAST) that DuckDB reproduces bit-for-bit — so the
    * entire LSH pipeline (signatures → band buckets → candidate dedup →
    * exact verify) is oracle-checked end-to-end rather than self-tested.
    * The xxhash64 variant stays the full-corpus fast path; this one is
    * the auditable sample pass a data-quality job runs. */
  /** md5-family MinHash signatures over the deterministic 10% sample
    * (doc_id % 10 = 0): the shared signature pass of q_llm_minhash_md5
    * (banded dedup) and q_llm_minhash_est (estimator audit). 8 60-bit
    * components per doc, bit-reproducible in DuckDB. */
  private def md5SampleSig(s: SparkSession, dir: String): DataFrame =
    tokenSets(s, dir)
      .filter(col("doc_id") % 10 === 0 && size(col("toks")) > 0)
      .withColumn("sig",
        array((0 until 8).map { j =>
          array_min(transform(col("toks"), t =>
            Dsl.md5Hash60(concat(lit(s"$j:"), t))))
        }: _*))

  case class MhIn(lang: String, sig: Seq[Long])
  case class MhState(lang: String, n_docs: Long, mins: Seq[Long])

  /** Per-lang union-sketch fold: element-wise mins — order-blind,
    * idempotent, exactly the merge a distributed sketch union runs. */
  private[graft] def updateMh(lang: String, it: Iterator[MhIn],
      state: org.apache.spark.sql.streaming.GroupState[MhState]): Iterator[MhState] = {
    var st = state.getOption.getOrElse(
      MhState(lang, 0L, Seq.fill(8)(Long.MaxValue)))
    val acc = st.mins.toArray
    var n = st.n_docs
    it.foreach { r =>
      var i = 0
      while (i < 8) { acc(i) = math.min(acc(i), r.sig(i)); i += 1 }
      n += 1L
    }
    st = MhState(lang, n, acc.toSeq)
    state.update(st)
    Iterator.single(st)
  }

  /** STREAMING MinHash union maintainer — the per-source vocabulary
    * sketch a live ingest keeps (8 md5-permutation minima per lang,
    * 64 B of keyed state): the element-wise-min fold is order-blind
    * and idempotent, so the snapshot equals the batch per-lang minimum
    * over every token — min over docs of per-doc minima ≡ min over the
    * union (the sketch-merge identity). The snapshot estimates each
    * lang-pair's vocabulary Jaccard (matching slots / 8) and audits it
    * against the EXACT vocabulary Jaccard on the same sample — the
    * one-table estimate-vs-truth view a deployment sizes its
    * permutation count from. Runs on the 10 % doc sample (the md5
    * signature tier's declared scale). */
  def q_stream_minhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val snap = md5SampleSig(s, dir).select(col("lang"), col("sig")).as[MhIn]
      .groupByKey(_.lang)
      .flatMapGroupsWithState(org.apache.spark.sql.streaming.OutputMode.Update,
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)(updateMh)
      .toDF()
    val vocab = tokenSets(s, dir)
      .filter(col("doc_id") % 10 === 0 && size(col("toks")) > 0)
      .select(col("lang"), explode(col("toks")).as("t")).distinct()
    val sizes = vocab.groupBy(col("lang").as("ls")).agg(count(lit(1)).as("nv"))
    val inter = vocab.select(col("lang").as("la"), col("t"))
      .join(vocab.select(col("lang").as("lb"), col("t").as("t2")),
        col("t") === col("t2") && col("la") < col("lb"))
      .groupBy(col("la"), col("lb")).agg(count(lit(1)).as("ni"))
    val est = col("n_match").cast("double") / lit(8.0)
    val exact = coalesce(col("ni"), lit(0L)).cast("double") /
      (col("nva") + col("nvb") - coalesce(col("ni"), lit(0L))).cast("double")
    snap.select(col("lang").as("la"), col("mins").as("ma"))
      .join(snap.select(col("lang").as("lb"), col("mins").as("mb")),
        col("la") < col("lb"))
      .withColumn("n_match",
        expr("aggregate(zip_with(ma, mb, (x, y) -> IF(x = y, 1, 0)), 0, " +
          "(a, x) -> a + x)").cast("bigint"))
      .join(inter, Seq("la", "lb"), "left_outer")
      .join(broadcast(sizes.select(col("ls").as("la"), col("nv").as("nva"))),
        Seq("la"))
      .join(broadcast(sizes.select(col("ls").as("lb"), col("nv").as("nvb"))),
        Seq("lb"))
      .select(col("la").as("lang_a"), col("lb").as("lang_b"), col("n_match"),
        round(est, 6).as("est_jaccard"),
        round(exact, 6).as("exact_jaccard"),
        round(abs(est - exact), 6).as("abs_err"))
      .orderBy("lang_a", "lang_b")
  }

  def q_llm_minhash_md5(s: SparkSession, dir: String): DataFrame =
    minhashMd5Pairs(s, dir).orderBy("lang", "doc_a", "doc_b")

  /** md5-twin verified pairs, memoized per (session, dir): the
    * standalone twin query AND the round-14 xx audit both read this —
    * one signature + band + verify pass per session, not one per
    * consumer. */
  private[graft] def minhashMd5Pairs(s: SparkSession, dir: String): DataFrame =
    Mv.memo(s, s"minhashMd5Pairs|${docsKey(s, dir)}") { bs =>
      val numBands = 4
      val rowsPerBand = 2
      val sig = md5SampleSig(bs, dir)
      val banded = sig.select(col("lang"), col("doc_id"),
        posexplode(array((0 until numBands).map { b =>
          concat_ws("_",
            element_at(col("sig"), b * rowsPerBand + 1),
            element_at(col("sig"), b * rowsPerBand + 2))
        }: _*)).as(Seq("band_id", "band_val")))
      val a = banded.select(col("lang"), col("band_id"), col("band_val"),
        col("doc_id").as("doc_a"))
      val b = banded.select(col("lang").as("lang_b"), col("band_id").as("bid_b"),
        col("band_val").as("bv_b"), col("doc_id").as("doc_b"))
      val pairs = a.join(b, col("lang") === col("lang_b") && col("band_id") === col("bid_b") &&
          col("band_val") === col("bv_b") && col("doc_a") < col("doc_b"))
        .select(col("lang"), col("doc_a"), col("doc_b"))
        .distinct()
      jaccardVerify(bs, dir, pairs)
        .filter(col("jac") >= 0.5)
        .select(col("lang"), col("doc_a"), col("doc_b"), round(col("jac"), 6).as("jaccard"))
        .ckpt()
    }

  /** MinHash Jaccard-estimator audit (round 7; Broder 1997 §3: the
    * expected component-agreement rate of two MinHash signatures equals
    * the sets' Jaccard): over the md5-banded candidate pairs of the 10%
    * sample, est = (#agreeing components)/8 vs the EXACT token Jaccard,
    * aggregated per lang — n_pairs, mean est (exact eighth-multiples /
    * one division), MAE / bias / max error. This is the number that
    * justifies every signature budget decision in the dedup tier: a
    * production deployment monitors it on samples exactly like this
    * before trusting 8 components at 100 TB. Determinism: est is an
    * exact multiple of 1/8; |est−jac| and (est−jac) terms round-9 →
    * exact DECIMAL sums (the PSI recipe); one double division each at
    * the end. Same bounded candidate set as the dedup pass — no new
    * quadratic anywhere. */
  def q_llm_minhash_est(s: SparkSession, dir: String): DataFrame = {
    val numBands = 4
    val rowsPerBand = 2
    val sig = md5SampleSig(s, dir)
    val banded = sig.select(col("lang"), col("doc_id"),
      posexplode(array((0 until numBands).map { b =>
        concat_ws("_",
          element_at(col("sig"), b * rowsPerBand + 1),
          element_at(col("sig"), b * rowsPerBand + 2))
      }: _*)).as(Seq("band_id", "band_val")))
    val a = banded.select(col("lang"), col("band_id"), col("band_val"),
      col("doc_id").as("doc_a"))
    val b = banded.select(col("lang").as("lang_b"), col("band_id").as("bid_b"),
      col("band_val").as("bv_b"), col("doc_id").as("doc_b"))
    val pairs = a.join(b, col("lang") === col("lang_b") && col("band_id") === col("bid_b") &&
        col("band_val") === col("bv_b") && col("doc_a") < col("doc_b"))
      .select(col("lang"), col("doc_a"), col("doc_b"))
      .distinct()
    val sa = sig.select(col("doc_id").as("sid_a"), col("sig").as("sig_a"))
    val sb = sig.select(col("doc_id").as("sid_b"), col("sig").as("sig_b"))
    val agree = (1 to 8).map(j =>
      when(element_at(col("sig_a"), j) === element_at(col("sig_b"), j), 1L)
        .otherwise(0L)).reduce(_ + _)
    val scored = jaccardVerify(s, dir, pairs)
      .join(sa, col("doc_a") === col("sid_a"))
      .join(sb, col("doc_b") === col("sid_b"))
      .withColumn("agree", agree)
      .withColumn("est", col("agree").cast("double") / 8.0)
      .withColumn("errt", round(abs(col("est") - col("jac")), 9).cast("decimal(18,9)"))
      .withColumn("biast", round(col("est") - col("jac"), 9).cast("decimal(18,9)"))
    scored.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("agree")).as("sum_agree"),
        sum(col("errt")).as("sum_err"), sum(col("biast")).as("sum_bias"),
        max(col("errt")).cast("double").as("max_abs_err"))
      .select(col("lang"), col("n_pairs"),
        (col("sum_agree").cast("double")
          / (col("n_pairs") * 8).cast("double")).as("mean_est"),
        (col("sum_err").cast("double") / col("n_pairs").cast("double")).as("mae"),
        (col("sum_bias").cast("double") / col("n_pairs").cast("double")).as("bias"),
        col("max_abs_err"))
      .orderBy("lang")
  }

  /** Measured operating bands for the xx-SimHash audit (round-14
    * bracket oracle). Measured at sf0.001 / sf0.01 / sf0.1 (Scratch14
    * sweep, archived in APPROX_BOUNDS.json `simhash_xx`):
    * full-corpus precision vs exact Jaccard ≥ 0.5 on the emitted pairs
    * = 0.9771 / 0.9794 / 0.9838 (floor 0.95 — r15 tightening, just
    * under the weakest measured point); sampled-pass recall on
    * strong (J ≥ 0.8) exact pairs = 0.3333 / 0.2419 / 0.2861 and
    * agreement with the oracled md5 twin = 0.3333 / 0.2750 / 0.2749 —
    * both asserted INSIDE [lo, hi] bands hugging the measured range
    * ([0.22, 0.4] / [0.26, 0.4]), because the LOW recall is the
    * contract (4×16/≤12 is the precision screen, SURVEY designation):
    * a recall jump past the band would mean the operating point no
    * longer matches its designation, exactly as much a drift as a
    * collapse. */
  val SimhashPrecisionLo = 0.95
  val SimhashRecallStrongBand: (Double, Double) = (0.22, 0.4)
  val SimhashTwinAgreeBand: (Double, Double) = (0.26, 0.4)

  /** SimHash near-dup AUDIT (Charikar 2002; round-14 bracket oracle):
    * the 64-bit xxhash64 signature pipeline — 4×16-bit band join,
    * Hamming ≤ 12 verify (`simhashXx`) — scored against (a) exact
    * token-set Jaccard on its own emitted pairs (full corpus; the join
    * is pair-set-sized, never quadratic), (b) the exact strong-pair
    * ground truth on the deterministic 10% sample, and (c) the oracled
    * md5-family twin `q_llm_simhash_md5` on the same sample. Exact
    * columns (twin + ground-truth pair counts) hash-match the DuckDB
    * replay; the xx-side quality lands as within-measured-band booleans
    * the oracle asserts TRUE. The designation this audit pins: 4×16/≤12
    * is a PRECISION SCREEN (precision ≥ 0.9 asserted; recall ~0.29 on
    * strong near-dups BY DESIGN — for recall run q_llm_simhash_recall
    * (6×10-bit md5 bands, Hamming ≤ 16) or the MinHash LSH tier). */
  def q_llm_simhash(s: SparkSession, dir: String): DataFrame =
    simhashAudit(s, dir,
      simhashXx(s, dir, sampled = false),
      simhashXx(s, dir, sampled = true).select(col("doc_a"), col("doc_b")))

  /** Audit body, parameterized over the two xx legs (the minhashAudit
    * pattern) so Round21Spec can feed PERTURBED pair sets and prove the
    * simhash envelope booleans flip too. */
  private[graft] def simhashAudit(s: SparkSession, dir: String,
      xxFull: DataFrame, xxSampled: DataFrame): DataFrame = {
    // sampled xx feeds 3 consumers, md5 + exact ground truth 2 each:
    // materialize each once (all are sample- or pair-set-bounded).
    // Mv contract first (Mv.scala: builds are single-threaded per
    // session): construct the md5 plan and warm the exact ground-truth
    // MV on THIS thread — any cold memo build runs here, serially —
    // then overlap the two per-query ckpt materializations, which are
    // independent pipelines over already-built MVs, on driver threads
    // (Par.run, guide §2.6) instead of paying two sequential chains.
    val md5Df = q_llm_simhash_md5(s, dir).select(col("doc_a"), col("doc_b"))
    val exactS = exactSamplePairs(s, dir) // memoized checkpoint-backed MV
    val Seq(xxS, md5) = Par.run(Seq[() => DataFrame](
      () => xxSampled.ckpt(),
      () => md5Df.ckpt()))
    // full-corpus precision: exact-verify ONLY the emitted pairs
    val fullAgg = jaccardVerify(s, dir,
        xxFull.select(col("lang"), col("doc_a"), col("doc_b")))
      .agg(count(lit(1)).as("n_xx"),
        coalesce(sum(when(col("jac") >= 0.5, 1L)), lit(0L)).as("n_xx_true"))
    val exAgg = exactS.agg(count(lit(1)).as("n_exact_sample_pairs"),
      coalesce(sum(when(col("jaccard") >= 0.8, 1L)), lit(0L)).as("n_exact_strong"))
    val hit = exactS.filter(col("jaccard") >= 0.8)
      .join(xxS, Seq("doc_a", "doc_b"), "left_semi")
      .agg(count(lit(1)).as("n_hit_strong"))
    val md5Agg = md5.agg(count(lit(1)).as("n_md5_pairs"))
    val sAgg = xxS.agg(count(lit(1)).as("n_xx_s"))
    val both = xxS.join(md5, Seq("doc_a", "doc_b"), "left_semi")
      .agg(count(lit(1)).as("n_both"))
    val recallS = col("n_hit_strong").cast("double") / col("n_exact_strong").cast("double")
    val agree = col("n_both").cast("double") /
      greatest(col("n_xx_s"), col("n_md5_pairs")).cast("double")
    fullAgg.crossJoin(exAgg).crossJoin(hit).crossJoin(md5Agg).crossJoin(sAgg)
      .crossJoin(both).select(
        col("n_md5_pairs"), col("n_exact_sample_pairs"), col("n_exact_strong"),
        (col("n_xx") === 0 ||
          col("n_xx_true").cast("double") >= lit(SimhashPrecisionLo) * col("n_xx").cast("double"))
          .as("precision_ok"),
        (col("n_exact_strong") === 0 ||
          (recallS >= SimhashRecallStrongBand._1 && recallS <= SimhashRecallStrongBand._2))
          .as("recall_strong_in_band"),
        (greatest(col("n_xx_s"), col("n_md5_pairs")) === 0 ||
          (agree >= SimhashTwinAgreeBand._1 && agree <= SimhashTwinAgreeBand._2))
          .as("twin_agree_in_band"),
        (col("n_xx") > 0).as("xx_nonempty"))
  }

  /** Exact same-lang Jaccard ≥ 0.5 pairs RESTRICTED to the deterministic
    * 10% sample (doc_id % 10 = 0): the sample-scoped ground truth the
    * simhash audit scores against. Inherits the exact-baseline fence
    * (the sample is 10% of the corpus, so the fence holds with 10×
    * headroom whenever q_llm_jaccard_pairs' does); same size-prune +
    * shared jaccardVerify formula as the full exact path. */
  private[graft] def exactSamplePairs(s: SparkSession, dir: String): DataFrame =
    // Memoized (r15): the q_llm_simhash audit AND every ApproxBounds
    // measurement point score against this same sample-scoped ground
    // truth — one all-pairs verify per (session, fixture).
    Mv.memo(s, s"exactSamplePairs|${docsKey(s, dir)}") { bs =>
      val d = tokenSets(bs, dir)
        .filter(col("doc_id") % 10 === 0 && size(col("toks")) > 0)
        .select(col("doc_id"), col("lang"), size(col("toks")).cast("bigint").as("nt"))
      val a = d.select(col("lang"), col("doc_id").as("doc_a"), col("nt").as("pna"))
      val b = d.select(col("lang").as("lang_b"), col("doc_id").as("doc_b"), col("nt").as("pnb"))
      val pairs = a.join(b, col("lang") === col("lang_b") && col("doc_a") < col("doc_b") &&
          col("pna") <= col("pnb") * 2 && col("pnb") <= col("pna") * 2)
        .select(col("lang"), col("doc_a"), col("doc_b"))
      jaccardVerify(bs, dir, pairs)
        .filter(col("jac") >= 0.5)
        .select(col("doc_a"), col("doc_b"), round(col("jac"), 6).as("jaccard"))
        .ckpt("exactSamplePairs")
    }

  /** The xx-signature pipeline, optionally restricted to the SAME
    * deterministic 10% sample the md5 twin runs on — that restriction is
    * what lets ApproxBounds measure the fast path against the exact
    * Jaccard ground truth and the oracled twin on identical input
    * (VERDICT r8 item 5). */
  private[graft] def simhashXx(s: SparkSession, dir: String, sampled: Boolean): DataFrame =
    simhashXxParam(s, dir, nBands = 4, hammingMax = 12, sampled = sampled)

  /** Band/threshold-parameterized xx-SimHash (VERDICT r9 item 4): the
    * 64-bit signature split into `nBands` equal bands (bands must divide
    * 64; more/narrower bands = higher candidate recall at a larger
    * bucket-join fan-out — at 100 TB, band width below ~8 bits makes
    * bucket occupancy corpus-fractional and the join quadratic, so the
    * production setting stays 4×16), then exact Hamming verify at
    * `hammingMax`. ApproxBounds sweeps this grid against the exact
    * Jaccard ground truth so a user can choose simhash-vs-minhash from
    * measured recall/precision, not folklore. */
  /** Full-corpus 64-bit xx SimHash signature table, memoized per
    * (session, fixture) — r15 perf recovery: the signature is
    * independent of the band/threshold operating point AND of the
    * sample restriction, so ONE build serves the q_llm_simhash audit's
    * full and sampled legs plus every ApproxBounds grid point (each
    * formerly re-ran tokenSets + SimHash64 over the whole corpus). */
  private[graft] def simhashXxSig(s: SparkSession, dir: String): DataFrame =
    Mv.memo(s, s"simhashXxSig|${docsKey(s, dir)}") { bs =>
      bs.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_simhash64", exprs => graft.functions.SimHash64(exprs.head), "built-in")
      tokenSets(bs, dir).filter(size(col("toks")) > 0)
        .withColumn("simhash", call_function("graft_simhash64", col("toks")))
        .select(col("doc_id"), col("lang"), col("simhash"))
        .ckpt("simhashXxSig")
    }

  private[graft] def simhashXxParam(s: SparkSession, dir: String, nBands: Int,
      hammingMax: Int, sampled: Boolean): DataFrame = {
    require(64 % nBands == 0, s"bands must divide 64, got $nBands")
    val bandBits = 64 / nBands
    val bandMask = if (bandBits == 64) -1L else (1L << bandBits) - 1
    // materialized once per session (MV): banding + both Hamming-verify
    // sides read the checkpoint; the sampled leg is a filter of it
    val sig0 = simhashXxSig(s, dir)
    val sig = if (sampled) sig0.filter(col("doc_id") % 10 === 0) else sig0
    val banded = sig.select(col("lang"), col("doc_id"),
      posexplode(array((0 until nBands).map { b =>
        expr(s"shiftright(simhash, ${bandBits * b}) & $bandMask")
      }: _*)).as(Seq("band_id", "band_val")))
    val a = banded.select(col("lang"), col("band_id"), col("band_val"),
      col("doc_id").as("doc_a"))
    val b = banded.select(col("lang").as("lb"), col("band_id").as("bb"),
      col("band_val").as("vb"), col("doc_id").as("doc_b"))
    val pairs = a.join(b, col("lang") === col("lb") && col("band_id") === col("bb") &&
        col("band_val") === col("vb") && col("doc_a") < col("doc_b"))
      .select(col("lang"), col("doc_a"), col("doc_b"))
      .distinct()
    pairs
      .join(broadcast(sig.select(col("doc_id").as("ia"), col("simhash").as("ha"))),
        col("doc_a") === col("ia"))
      .join(broadcast(sig.select(col("doc_id").as("ib"), col("simhash").as("hb"))),
        col("doc_b") === col("ib"))
      .withColumn("hamming", expr("bit_count(ha ^ hb)").cast("int"))
      .filter(col("hamming") <= hammingMax)
      .select(col("lang"), col("doc_a"), col("doc_b"), col("hamming"))
    // no ORDER BY: private pipeline, order-blind consumers (audit
    // aggregates + ApproxBounds) — the md5 twin below keeps its sort
    // because it IS a registered ordered output
  }

  /** Cross-engine-verifiable SimHash on the deterministic 10% sample:
    * 60-bit signature (md5-derived per-token hash — 15 hex chars decode
    * to a bigint in both engines), bit votes and signature assembly as
    * plain relational aggregation (60 conditional sums + a shift-sum),
    * 4×15-bit band join, Hamming ≤ 12 verify via bit_count(xor).
    * Everything is oracle-checked; the xxhash64 SimHash64-expression
    * variant stays the full-corpus fast path. */
  def q_llm_simhash_md5(s: SparkSession, dir: String): DataFrame =
    simhashMd5Param(s, dir, nBands = 4, hammingMax = 12)

  /** RECALL operating point of the md5-family SimHash (VERDICT r10
    * item 6): narrower 10-bit bands (6 of them over the 60-bit
    * signature) raise candidate recall the same way the measured
    * xx-path sweep's 8×8-bit point does (recall 0.96 @ precision 0.91,
    * APPROX_BOUNDS.json `simhash_sweep`), and the looser Hamming ≤ 16
    * verify keeps the recalled pairs. Fully oracle-checked — this is
    * the contract-tested twin of the swept configuration, where
    * q_llm_simhash_md5 remains the 4×15/≤12 precision screen. */
  def q_llm_simhash_recall(s: SparkSession, dir: String): DataFrame =
    simhashMd5Param(s, dir, nBands = 6, hammingMax = 16)

  /** md5-family 60-bit SimHash signatures over the 10% sample —
    * session MV: the banding pass and both Hamming-verify sides read
    * it, and BOTH registered operating points (q_llm_simhash_md5 /
    * q_llm_simhash_recall) plus the q_llm_simhash audit share the one
    * build, which would otherwise re-run the whole token-explode +
    * md5 + 60-vote aggregation per consumer. */
  private[graft] def simhashMd5Sig(s: SparkSession, dir: String): DataFrame =
    Mv.memo(s, s"simhashMd5Sig|${docsKey(s, dir)}") { bs =>
      val d = tokenSets(bs, dir)
        .filter(col("doc_id") % 10 === 0 && size(col("toks")) > 0)
      val tok = d.select(col("doc_id"), col("lang"), explode(col("toks")).as("tok"))
        .withColumn("h", Dsl.md5Hash60(col("tok")))
      val votes = (0 until 60).map(b =>
        sum(when(expr(s"shiftright(h, $b) & 1") === 1, 1).otherwise(-1)).as(s"v$b"))
      val sigExpr = (0 until 60)
        .map(b => s"(CASE WHEN v$b > 0 THEN ${1L << b}L ELSE 0L END)").mkString(" + ")
      tok.groupBy(col("doc_id"), col("lang"))
        .agg(votes.head, votes.tail: _*)
        .select(col("doc_id"), col("lang"), expr(sigExpr).as("simhash"))
        .ckpt("simhashMd5Sig")
    }

  /** Band/threshold-parameterized md5-family SimHash (bands must divide
    * 60) — one body under the precision screen AND the recall tier, so
    * both operating points run the same signature arithmetic. */
  private def simhashMd5Param(s: SparkSession, dir: String, nBands: Int,
      hammingMax: Int): DataFrame = {
    require(60 % nBands == 0, s"bands must divide 60, got $nBands")
    val bandBits = 60 / nBands
    val bandMask = (1L << bandBits) - 1
    val sig = simhashMd5Sig(s, dir)
    val banded = sig.select(col("lang"), col("doc_id"),
      posexplode(array((0 until nBands).map { b =>
        expr(s"shiftright(simhash, ${bandBits * b}) & $bandMask")
      }: _*)).as(Seq("band_id", "band_val")))
    val a = banded.select(col("lang"), col("band_id"), col("band_val"),
      col("doc_id").as("doc_a"))
    val b = banded.select(col("lang").as("lb"), col("band_id").as("bb"),
      col("band_val").as("vb"), col("doc_id").as("doc_b"))
    val pairs = a.join(b, col("lang") === col("lb") && col("band_id") === col("bb") &&
        col("band_val") === col("vb") && col("doc_a") < col("doc_b"))
      .select(col("lang"), col("doc_a"), col("doc_b"))
      .distinct()
    pairs
      .join(broadcast(sig.select(col("doc_id").as("ia"), col("simhash").as("ha"))),
        col("doc_a") === col("ia"))
      .join(broadcast(sig.select(col("doc_id").as("ib"), col("simhash").as("hb"))),
        col("doc_b") === col("ib"))
      .withColumn("hamming", expr("bit_count(ha ^ hb)").cast("int"))
      .filter(col("hamming") <= hammingMax)
      .select(col("lang"), col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy("lang", "doc_a", "doc_b")
  }

  // ── similarity search ────────────────────────────────────────────────

  /** Brute-force cosine top-k for one query vector: the correctness
    * baseline. Query side is a broadcast single row; the scan is one
    * pass, no shuffle until the final top-k (TakeOrderedAndProject). */
  def q_llm_cosine_topk(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val t = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("tv"), normCol(s)(col("embedding")).as("tn"))
    emb.filter(col("vec_id") =!= 0)
      .withColumn("vn", normCol(s)(col("embedding")))
      .crossJoin(broadcast(t))
      .select(col("vec_id"),
        round(cosSimPre(s)(col("embedding"), col("tv"), col("vn"), col("tn")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(10)
  }

  /** kNN join: top-3 cosine neighbors for each query vector (vec_id<20).
    * Broadcast-nested-loop with the tiny query side broadcast; per-query
    * ranking via window. */
  def q_llm_knn_join(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val q = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        normCol(s)(col("embedding")).as("qn"))
    val cand = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"),
      normCol(s)(col("embedding")).as("nn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    cand.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosSimPre(s)(col("nv"), col("qv"), col("nn"), col("qn")), 6).as("cos_sim"))
      .withColumn("rnk", row_number().over(w).cast("bigint"))
      .filter(col("rnk") <= 3)
      .orderBy("query_id", "rnk")
  }

  /** Temperature for the source-mixing weights. */
  val MixTau = 0.7

  /** Temperature-scaled dataset-mixing weights per (lang, source)
    * stratum (the Pile/Gopher/mT5 sampling device: w ∝ n^τ, τ=0.7 —
    * upweights small sources without letting giants drown the mix):
    * exact integer token counts; n^τ spelled exp(τ·ln n) with the
    * probed cross-engine ln/exp policy, each term rounded at the 9th
    * decimal into an exact DECIMAL sum (order-blind normalizer); the
    * temperature share and the oversampling boost vs the raw share are
    * pinned-order double expressions. Output stratum-count-sized. */
  def q_llm_mix_temperature(s: SparkSession, dir: String): DataFrame = {
    val strata = Tables.documents(s, dir)
      .select(col("lang"), col("source"),
        size(split(col("text"), " ")).cast("bigint").as("nt"))
      .groupBy(col("lang"), col("source"))
      .agg(sum(col("nt")).as("n_tokens"))
    val term = round(exp(lit(MixTau) * log(col("n_tokens").cast("double"))), 9)
      .cast("decimal(28,9)")
    val wTab = strata.withColumn("w", term)
    val tot = wTab.agg(sum(col("w")).as("wsum"),
      sum(col("n_tokens")).as("ntot"))
    wTab.crossJoin(broadcast(tot))
      .select(col("lang"), col("source"), col("n_tokens"),
        round(col("n_tokens").cast("double") / col("ntot").cast("double"), 6)
          .as("raw_share"),
        round(col("w").cast("double") / col("wsum").cast("double"), 6)
          .as("temp_share"),
        round((col("w").cast("double") / col("wsum").cast("double"))
          / (col("n_tokens").cast("double") / col("ntot").cast("double")), 6)
          .as("boost"))
      .orderBy("lang", "source")
  }

  /** MRL prefix width: the 16-dim head of the 64-dim embedding. */
  val MrlPrefixDims = 16

  /** Matryoshka (MRL, Kusupati et al. 2022) truncation-fidelity audit:
    * how much of the FULL-dimension top-10 cosine neighborhood survives
    * when vectors are truncated to their 16-dim prefix — the question a
    * deployment asks before serving the cheap prefix index. Per query
    * (vec_id 20–24): both top-10 ranked lists (round-6 cosine, id
    * tie-break), overlap count, recall@10. Scale: the query side is a
    * 5-row broadcast; each candidate is scored once per dim tier in one
    * scan; the rank windows are query-partitioned. */
  def q_embed_mrl(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val pre = emb.select(col("vec_id"), col("embedding"),
      slice(col("embedding"), 1, MrlPrefixDims).as("emb16"))
    val q = pre.filter(col("vec_id") >= 20 && col("vec_id") <= 24)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("emb16").as("qv16"))
    val scored = pre.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(cosSim(s)(col("embedding"), col("qv")), 6).as("cos_full"),
        round(cosSim(s)(col("emb16"), col("qv16")), 6).as("cos_16"))
    val wf = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_full").desc, col("neighbor_id").asc)
    val wp = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_16").desc, col("neighbor_id").asc)
    val ranked = scored
      .withColumn("rf", row_number().over(wf))
      .withColumn("rp", row_number().over(wp))
    ranked.groupBy(col("query_id"))
      .agg(sum(when(col("rf") <= 10 && col("rp") <= 10, 1L).otherwise(0L))
        .as("n_overlap"))
      .select(col("query_id"), col("n_overlap"),
        round(col("n_overlap").cast("double") / 10.0, 6).as("recall_at_10"))
      .orderBy("query_id")
  }

  /** Embedding-cosine near-dup pairs on a deterministic 25% sample
    * (vec_id % 4 = 0): all-pairs cosine ≥ 0.35.
    *
    * EXACT BASELINE — not the scale path. All-pairs by design (bounded by
    * the sample): the ground truth the bucketed production twins
    * (q_llm_semdedup cell-scoped dedup, q_llm_simhash hyperplane banding)
    * are tested against. Do NOT scale its sample up; see PERF.md
    * "exact-baseline fences". */
  /** Fixed-count sample for the exact neardup baseline (the twonn
    * device, r13): step = ceil(n / target) bounds the all-pairs stage
    * to ~target² at ANY corpus size — the former fixed 25% fraction
    * made the pair space grow quadratically with the data. */
  val EmbedNeardupSampleTarget = 500L

  def q_llm_embed_neardup(s: SparkSession, dir: String): DataFrame = {
    val n = Tables.embeddings(s, dir).count() // 1-row driver scalar
    val step = math.max(1L, (n + EmbedNeardupSampleTarget - 1) / EmbedNeardupSampleTarget)
    val sub = Tables.embeddings(s, dir).filter(col("vec_id") % lit(step) === 0)
      .withColumn("nrm", normCol(s)(col("embedding")))
    val a = sub.select(col("vec_id").as("vec_a"), col("embedding").as("ea"), col("nrm").as("na"))
    val b = sub.select(col("vec_id").as("vec_b"), col("embedding").as("eb"), col("nrm").as("nb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cos_sim", round(cosSimPre(s)(col("ea"), col("eb"), col("na"), col("nb")), 6))
      .filter(col("cos_sim") >= 0.35)
      .select(col("vec_a"), col("vec_b"), col("cos_sim"))
      .orderBy("vec_a", "vec_b")
  }

  /** Memoized embeddings-count probe (freshness-keyed like docCount):
    * one scalar per (session, fixture), read by every capacity rule of
    * the vector tier below. */
  private val embCountCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), java.lang.Long]()

  private[graft] def embCount(s: SparkSession, dir: String): Long =
    embCountCache.computeIfAbsent(
      (s.sparkContext.applicationId, s"$dir|${tableFreshness(s, dir, "embeddings")}"),
      _ => Tables.embeddings(s, dir).count())

  /** SCALE-ADAPTIVE coarse-quantizer capacity (VERDICT r15 item 1 —
    * the one scale-killer-class finding): nlist = max(16, ⌊√n_vecs⌋)
    * smallest vec_ids — the standard IVF sizing rule (FAISS guideline:
    * nlist ≈ √n). With ~√n cells of expected population ~√n,
    * q_llm_semdedup's within-cell pair join does O(Σ cell²) = O(n^1.5)
    * work — sub-quadratic and shrinking relative to n² as the corpus
    * grows (the fixed 16-cell quantizer was O(n²/16), i.e. genuinely
    * quadratic) — and the IVF per-query cell scan is O(√n). SemDeDup
    * (Abbas et al. 2023) runs ~10⁵ clusters at web scale for exactly
    * this reason. The rule is a deterministic function of corpus
    * size shared with every oracle CTE (`GREATEST(16, FLOOR(SQRT(n)))`
    * — the JaccardExactMaxDocsPerLang computed-constant precedent), so
    * both engines derive the same capacity from the data and the hash
    * match certifies the agreement. ⌊√n⌋ via IEEE sqrt is exact for all
    * n ≤ 2^53 (correctly-rounded sqrt of exact squares), matching
    * DuckDB's FLOOR(SQRT(n)) bit-for-bit. */
  /** DENSE-ID FIXTURE CONTRACT (ADVICE r16): the ANN tier's
    * deterministic centroid/codebook selections (`vec_id < nlist`,
    * codebook = vec_ids nlist..nlist+15) assume vec_ids are dense
    * 0..n−1 — the embeddings fixture's documented shape (FIXTURES.md),
    * pinned by Round23Spec (max(vec_id) = n−1). On a gapped-id corpus
    * both engines still compute the SAME (smaller) centroid set — the
    * oracle shares the rule — but the "nlist smallest vec_ids" reading
    * would need a rank-over-vec_id selection instead. */
  private[graft] def ivfNlist(s: SparkSession, dir: String): Long =
    math.max(16L, math.floor(math.sqrt(embCount(s, dir).toDouble)).toLong)

  /** IVF-style ANN search: coarse quantization to the nearest of
    * `ivfNlist` centroids (deterministically the first ⌊√n⌋ vectors),
    * then each query scans ONLY its own cell — the inverted-file
    * pattern that turns brute-force O(n) per query into O(√n). Fully
    * deterministic (rounded cosines + id tie-breaks), so it is
    * oracle-checked exactly. */
  /** Shared IVF cell assignment (single source of truth for the
    * assignment convention — centroids = the `nlist` smallest vec_ids,
    * rounded-cosine argmax with cid tie-break): EVERY vector of the
    * corpus labeled with its nearest centroid (centroid rows are data
    * too — a real IVF indexes all vectors; r16 unified the former
    * mixed convention where the ANN queries excluded vec_id < 16).
    * q_llm_ann_ivf, q_llm_ann_ivfpq, q_llm_ann_recall{,_curve} and
    * q_llm_semdedup (and their oracles' `nl`/`ac`/`ar`/`assigned`
    * CTEs) must stay in sync with this. */
  /** Session MV (r17): the n × nlist cosine cross-join is rebuilt by
    * NINE ANN-tier operators — memoized per (session, embeddings
    * generation), it runs once per board sweep. */
  private def ivfAssign(s: SparkSession, dir: String): DataFrame =
    Mv.memo(s, s"ivfAssign|${tablesKey(s, dir, Seq("embeddings"))}") { bs =>
      val emb = Tables.embeddings(bs, dir)
      val nlist = ivfNlist(bs, dir)
      val cents = emb.filter(col("vec_id") < nlist)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"),
          normCol(bs)(col("embedding")).as("cn"))
      val data = emb.select(col("vec_id").as("vid"), col("embedding").as("dv"),
        normCol(bs)(col("embedding")).as("dn"))
      val wAssign = Window.partitionBy(col("vid")).orderBy(col("ccos").desc, col("cid").asc)
      data.crossJoin(broadcast(cents))
        .withColumn("ccos", round(cosSimPre(bs)(col("dv"), col("cv"), col("dn"), col("cn")), 6))
        .withColumn("arn", row_number().over(wAssign)).filter(col("arn") === 1)
        .select(col("vid"), col("cid"), col("dv"), col("dn"))
        .ckpt("ivf_assign")
    }

  def q_llm_ann_ivf(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val assigned = ivfAssign(s, dir)
    val qs = assigned.filter(col("vid").between(20, 24))
      .select(col("vid").as("query_id"), col("cid").as("qcid"),
        col("dv").as("qv"), col("dn").as("qn"))
    val wS = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    qs.join(assigned.select(col("vid").as("neighbor_id"), col("cid").as("ncid"),
        col("dv").as("nv"), col("dn").as("nn")),
        col("qcid") === col("ncid") && col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", round(cosSimPre(s)(col("qv"), col("nv"), col("qn"), col("nn")), 6))
      .withColumn("rnk", row_number().over(wS).cast("bigint"))
      .filter(col("rnk") <= 3)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"), col("rnk"))
      .orderBy("query_id", "rnk")
  }

  /** Multi-probe widths for the nprobe operating curve (search-quality
    * knobs a deployment tunes, NOT corpus capacity — nlist is the
    * adaptive capacity; nprobe trades candidate cost for recall at any
    * nlist). */
  val NProbes = Seq(1, 2, 4)

  /** MULTI-PROBE IVF search operating curve (r16 — the real FAISS
    * search shape: a query scans its `nprobe` NEAREST cells, not just
    * its own; Jégou et al. 2011 §IV, FAISS nprobe): for each width in
    * NProbes, recall@3 of the nprobe-cell-scoped search against the
    * exact brute-force ranking, aggregated over the 5 anchor queries —
    * the table a deployment picks nprobe from (recall rises toward
    * 1.0 as nprobe grows while candidate cost stays nprobe·(n/nlist) =
    * nprobe·√n per query). Fully deterministic (rounded cosines +
    * id/cid tie-breaks), so the curve is oracle-checked exactly.
    *
    * Scale shape: the centroid ranking is |Q|·nlist = |Q|·√n rows
    * (broadcast centroids); candidates are cell-bounded per (query,
    * width); the exact leg reuses the ann_recall brute-force device on
    * the 5-query anchor set. */
  def q_llm_ann_nprobe(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val nlist = ivfNlist(s, dir)
    val assigned = ivfAssign(s, dir)
    val qs = assigned.filter(col("vid").between(20, 24))
      .select(col("vid").as("query_id"), col("dv").as("qv"), col("dn").as("qn"))
    // per-query centroid ranking: |Q| × nlist rows, broadcast centroids
    val cents = emb.filter(col("vec_id") < nlist)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"),
        normCol(s)(col("embedding")).as("cn"))
    val wC = Window.partitionBy(col("query_id"))
      .orderBy(col("ccos").desc, col("cid").asc)
    val qcells = qs.crossJoin(broadcast(cents))
      .withColumn("ccos", round(cosSimPre(s)(col("qv"), col("cv"), col("qn"), col("cn")), 6))
      .withColumn("cell_rank", row_number().over(wC))
      .filter(col("cell_rank") <= NProbes.max)
      .select(col("query_id").as("cq"), col("cid").as("ccid"), col("cell_rank"))
    // candidates once at the widest nprobe, with the cell rank attached
    val wS = Window.partitionBy(col("np"), col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    val cand = assigned.select(col("vid").as("neighbor_id"), col("cid").as("ncid"),
        col("dv").as("nv"), col("dn").as("nn"))
      .join(broadcast(qcells), col("ncid") === col("ccid"))
      .join(broadcast(qs), col("cq") === col("query_id")
        && col("neighbor_id") =!= col("query_id"))
      .withColumn("cos_sim", round(cosSimPre(s)(col("qv"), col("nv"), col("qn"), col("nn")), 6))
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"), col("cell_rank"))
    val nps = s.range(0, 1)
      .select(explode(array(NProbes.map(np => lit(np)): _*)).as("np"))
    val ivfTop = cand.crossJoin(broadcast(nps))
      .filter(col("cell_rank") <= col("np"))
      .withColumn("rnk", row_number().over(wS))
      .filter(col("rnk") <= 3)
      .select(col("np"), col("query_id").as("iq"), col("neighbor_id").as("in"))
    // exact brute-force top-3 (the ann_recall device over all vectors)
    val wE = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    val exact = qs.crossJoin(
        emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"),
          normCol(s)(col("embedding")).as("nn")))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", round(cosSimPre(s)(col("qv"), col("nv"), col("qn"), col("nn")), 6))
      .withColumn("rnk", row_number().over(wE))
      .filter(col("rnk") <= 3)
      .select(col("query_id"), col("neighbor_id"))
    exact.crossJoin(broadcast(nps.select(col("np").as("enp"))))
      .join(ivfTop, col("enp") === col("np")
        && col("query_id") === col("iq") && col("neighbor_id") === col("in"),
        "left_outer")
      .groupBy(col("enp").cast("bigint").as("nprobe"))
      .agg(countDistinct(col("query_id")).as("n_queries"),
        sum(when(col("in").isNotNull, 1L).otherwise(0L)).as("n_hits"))
      .select(col("nprobe"), col("n_queries"), col("n_hits"),
        round(col("n_hits").cast("double")
          / (lit(3) * col("n_queries")).cast("double"), 6).as("recall_at_3"))
      .orderBy("nprobe")
  }

  /** Dedup clustering — the step AFTER pair generation that every real
    * dedup pipeline needs: near-dup pairs are edges, duplicate groups
    * are their connected components, and one canonical doc (min doc_id)
    * survives per component. Pairs: exact token-set Jaccard ≥ 0.8 on the
    * deterministic 10% sample (same jaccardVerify formula as
    * q_llm_jaccard_pairs, with the exact-preserving size prune
    * 5·min ≥ 4·max for J ≥ 0.8); components via the same monotone
    * min-label fixpoint loop as q_graph_cc. Per-lang accounting:
    * sampled docs, clusters, removable dups (= docs − clusters), and
    * the largest duplicate group. */
  /** Sampled dedup universe (doc, lang, token count) — session MV
    * shared by the cluster and soft-dedup passes. */
  private[engine] def dedupDocs(s: SparkSession, dir: String): DataFrame =
    Mv.memo(s, s"dedupDocs|${docsKey(s, dir)}") { bs =>
      val d = tokenSets(bs, dir)
        .filter(col("doc_id") % 10 === 0 && size(col("toks")) > 0)
        .select(col("doc_id"), col("lang"), size(col("toks")).cast("bigint").as("nt"))
        .ckpt()
      // same exact-baseline fence as q_llm_jaccard_pairs: the dedup
      // component MV's candidate stage is all-pairs per lang over this
      // sample — refuse past the shared bound rather than melt a cluster
      val maxPerLang = d.groupBy(col("lang")).agg(count(lit(1)).as("c"))
        .agg(max(col("c"))).collect()(0).getLong(0)
      require(maxPerLang <= JaccardExactMaxDocsPerLang,
        s"dedupDocs sample has $maxPerLang docs in one lang > fence " +
          s"$JaccardExactMaxDocsPerLang — use the LSH candidate path")
      d
    }

  /** Duplicate-component labels (node → min-id label) over the
    * 0.8-jaccard pair graph — the min-label fixpoint, materialized ONCE
    * per (session, fixture) because both dedup accounting passes (and
    * any future canonical-doc selection) consume the same components. */
  private[graft] def dedupLabels(s: SparkSession, dir: String): DataFrame =
    Mv.memo(s, s"dedupLabels|${docsKey(s, dir)}") { bs =>
      val docs = dedupDocs(bs, dir)
      val a = docs.select(col("lang"), col("doc_id").as("doc_a"), col("nt").as("pna"))
      val b = docs.select(col("lang").as("lang_b"), col("doc_id").as("doc_b"), col("nt").as("pnb"))
      val cand = a.join(b, col("lang") === col("lang_b") && col("doc_a") < col("doc_b") &&
          col("pna") * 4 <= col("pnb") * 5 && col("pnb") * 4 <= col("pna") * 5)
        .select(col("lang"), col("doc_a"), col("doc_b"))
      val pairs = jaccardVerify(bs, dir, cand).filter(col("jac") >= 0.8)
        .select(col("doc_a").as("x"), col("doc_b").as("y"))
      val ue = pairs.union(pairs.select(col("y").as("x"), col("x").as("y")))
        .ckpt()
      var labels = docs.select(col("doc_id").as("node"), col("doc_id").as("lbl"))
        .ckpt()
      var prevSum = labels.agg(sum(col("lbl"))).collect()(0).getLong(0)
      var converged = false
      while (!converged) {
        // label table is |sampled docs|-sized — route the broadcast
        // through the probe-gated docHint (VERDICT r17 item 5: an
        // unconditional broadcast is the one shape that breaks outright
        // at 100 TB doc counts; past the guard the hint drops and the
        // superstep runs as a shuffle join)
        val nbrMin = ue
          .join(docHint(s, dir, labels.select(col("node").as("bn"), col("lbl").as("blbl"))),
            col("y") === col("bn"))
          .groupBy(col("x")).agg(min(col("blbl")).as("nbr_min"))
        val next = labels
          .join(nbrMin, col("node") === col("x"), "left_outer")
          .select(col("node"), least(col("lbl"), coalesce(col("nbr_min"), col("lbl"))).as("lbl"))
          .ckpt()
        val curSum = next.agg(sum(col("lbl"))).collect()(0).getLong(0)
        labels = next
        converged = curSum == prevSum
        prevSum = curSum
      }
      labels
    }

  def q_llm_dedup_clusters(s: SparkSession, dir: String): DataFrame = {
    val docs = dedupDocs(s, dir)
    dedupLabels(s, dir).join(docs, col("node") === col("doc_id"))
      .groupBy(col("lang"), col("lbl")).agg(count(lit(1)).as("sz"))
      .groupBy(col("lang"))
      .agg(sum(col("sz")).as("n_docs"), count(lit(1)).as("n_clusters"),
        (sum(col("sz")) - count(lit(1))).as("n_dup_docs"),
        max(col("sz")).as("max_cluster"))
      .orderBy("lang")
  }

  /** SemDeDup (Abbas et al. 2023 "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): semantic dedup scoped
    * to coarse clusters — every vector assigns to its nearest of the
    * `ivfNlist` (= max(16, ⌊√n⌋)) deterministic IVF centroids (same
    * assignment as q_llm_ann_ivf), then inside each cell a vector is
    * dropped when an EARLIER cell-mate (smaller vec_id) has cosine
    * ≥ 0.35 with it. This is the one-pass keep-first relaxation of the
    * sequential greedy (a vector drops even if its witness itself
    * dropped) — the standard relational formulation, fully
    * deterministic. Per-cell drop accounting; cosines in double math,
    * rounded 6 (D5).
    *
    * Scale shape: the √n-row centroid table broadcasts; pair comparison
    * happens only WITHIN a cell. With cells scaling as √n the expected
    * cell population is ~√n, so the pair join does O(Σ cell²) = O(n^1.5)
    * work — the capacity rule is what makes semantic dedup
    * sub-quadratic at corpus scale (VERDICT r15 item 1: a FIXED cell
    * count made this O(n²/nlist); ScaleProbe's `emb` group measures the
    * pair-count growth at 1×/4×/16× vectors). */
  def q_llm_semdedup(s: SparkSession, dir: String): DataFrame = {
    // materialized ONCE: three consumers below (size agg + both pair-join
    // legs) would otherwise each re-run the window sort downstream of
    // the reused exchange (same pattern as GraphOps.partPairs)
    val emb = Tables.embeddings(s, dir)
    val assigned = ivfAssign(s, dir)
    val earlier = assigned.select(col("cid").as("ca"), col("vid").as("va"),
      col("dv").as("av"), col("dn").as("an"))
    val dropped = assigned
      .join(earlier, col("cid") === col("ca") && col("va") < col("vid"))
      .withColumn("cs", round(cosSimPre(s)(col("dv"), col("av"), col("dn"), col("an")), 6))
      .filter(col("cs") >= 0.35)
      .select(col("cid"), col("vid")).distinct()
    assigned.groupBy(col("cid")).agg(count(lit(1)).as("n_vecs"))
      .join(dropped.groupBy(col("cid").as("dc")).agg(count(lit(1)).as("n_dropped")),
        col("cid") === col("dc"), "left_outer")
      .select(col("cid"), col("n_vecs"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
        round(coalesce(col("n_dropped"), lit(0L)).cast("double") / col("n_vecs"), 6)
          .as("drop_share"))
      .orderBy("cid")
  }

  /** Random-hyperplane bit budget bounds for the LSH-bucketed ANN.
    * The bit count is SCALE-ADAPTIVE (VERDICT r15 item 1):
    * bits = clamp(⌈log₂ n⌉ − 4, 8, 16), i.e. 2^bits buckets targeting
    * an expected occupancy of ~16 vectors per bucket once the corpus
    * outgrows the 256-bucket floor — per-query candidate sets stay
    * O(1)-ish instead of the former fixed-8-bit O(n/256). The 16-bit
    * ceiling is an EXPLICIT fence, not a hidden constant: past
    * n ≈ 2^20 vectors an SRP demo index stops being the production
    * shape (bucket skew dominates) and q_llm_ann_ivfpq is the scale
    * path; the oracle replays the same clamp formula from the data, so
    * the operating point is hash-certified rather than assumed. */
  val LshBitsMin = 8
  val LshBitsMax = 16

  /** bits(n) — exact integer ⌈log₂ n⌉ (no float edge cases), clamped
    * to [LshBitsMin, LshBitsMax]. Mirrors the oracle's
    * GREATEST(min, LEAST(max, CEIL(LOG2(n)) - 4)). */
  private[graft] def lshBits(n: Long): Int = {
    val ceilLog2 = if (n <= 1L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(n - 1)
    math.max(LshBitsMin, math.min(LshBitsMax, ceilLog2 - 4))
  }

  /** Seeded INTEGER-valued hyperplane component (exactly representable
    * in f32 and f64, so the bucket-bit sign test is bit-identical across
    * engines — a fractional seed would differ between the float32 plan
    * constant and the oracle's double literal). */
  def hyperplane(j: Int, d: Int): Int = (j * 31 + d * 17) % 7 - 3

  /** LSH-bucketed ANN over embeddings (random-hyperplane / SRP-LSH,
    * Charikar 2002 §3): `lshBits(n)` sign bits of ⟨v, h_j⟩ form a
    * bucket id, each query (vec_id 20–24) scans ONLY its bucket — the
    * hashing counterpart of the IVF cell scan (q_llm_ann_ivf), one
    * linear signature pass + a bucket-equality join at any scale. The
    * seeded hyperplanes + left-to-right dot make the buckets
    * deterministic, so even this "approximate" structure is
    * oracle-checked exactly — including the adaptive bit count, which
    * the oracle recomputes from the same corpus size. */
  def q_llm_ann_lsh(s: SparkSession, dir: String): DataFrame = {
    val dot = vecDot(s) _
    val emb = Tables.embeddings(s, dir)
    val bucket = (0 until lshBits(embCount(s, dir))).map { j =>
      val h = typedlit((0 until 64).map(d => hyperplane(j, d).toFloat))
      when(dot(col("embedding"), h) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    val b = emb.select(col("vec_id"), col("embedding"), bucket.as("bucket"),
      normCol(s)(col("embedding")).as("nrm"))
    val qs = b.filter(col("vec_id").between(20, 24))
      .select(col("vec_id").as("query_id"), col("bucket").as("qb"),
        col("embedding").as("qv"), col("nrm").as("qn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    b.select(col("vec_id").as("neighbor_id"), col("bucket").as("nb"),
        col("embedding").as("nv"), col("nrm").as("nn"))
      .join(broadcast(qs), col("nb") === col("qb") && col("neighbor_id") =!= col("query_id"))
      .withColumn("cos_sim", round(cosSimPre(s)(col("nv"), col("qv"), col("nn"), col("qn")), 6))
      .withColumn("rnk", row_number().over(w).cast("bigint"))
      .filter(col("rnk") <= 3)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"), col("rnk"))
      .orderBy("query_id", "rnk")
  }

  // ── text analysis ────────────────────────────────────────────────────

  def q_llm_text_stats(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val base = docs.groupBy(col("lang")).agg(
      count(lit(1)).as("n_docs"),
      (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"),
      sum(size(split(col("text"), " "))).cast("bigint").as("total_tokens"))
    val uniq = docs.select(col("lang"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("lang")).agg(countDistinct(col("token")).as("uniq_tokens"))
    base.join(uniq, "lang").orderBy("lang")
  }

  /** Multimodal column: text metadata + embedding packed into a struct,
    * then projected through nested field access (flat deterministic
    * output for the oracle). */
  def q_llm_multimodal(s: SparkSession, dir: String): DataFrame =
    Tables.spread(s, Tables.documents(s, dir))
      .join(Tables.embeddings(s, dir), col("doc_id") === col("vec_id"))
      .select(struct(col("doc_id"), col("lang"), col("n_chars")).as("meta"),
        col("embedding"))
      .select(col("meta.doc_id").as("doc_id"), col("meta.lang").as("lang"),
        col("meta.n_chars").as("n_chars"),
        size(col("embedding")).cast("int").as("dim"),
        round(element_at(col("embedding"), 1).cast("double"), 6).as("e1"))
      .orderBy("doc_id")

  /** Bloom-prefiltered decontamination semi-join. At 100 TB the exact
    * "train grams ∩ held-out grams" semi-join shuffles the full train
    * gram stream; the standard fix is a broadcast Bloom filter built
    * from the (much smaller) held-out side, so only bloom-positive
    * grams reach the exact join. Here the filter is a RELATIONAL
    * blocked Bloom: 4096 × 63-bit buckets (bucket = (h div 4096) %
    * 4096, two probe bits h % 63 and (h div 64) % 63 — 63, not 64:
    * DuckDB's BIGINT << errors on bit 63), built with one bit_or
    * aggregate and broadcast as a ≤4096-row table. Membership = both
    * probe bits set. Bloom positives ⊇ true matches (no false
    * negatives by construction — same h family both sides), so the
    * exact confirm join restores exactness; the oracle replays BOTH
    * the candidate accounting and the exact counts in SQL, so the
    * bloom arithmetic itself is cross-engine-checked. Word-5-grams
    * (vs contamination's 8): the two ops probe different overlap
    * scales and opposite directions (here: which TRAIN docs to drop). */
  def q_llm_bloom_prefilter(s: SparkSession, dir: String): DataFrame = {
    // widen the 1-split fixture scan: the 5-gram + md5 kernel is the
    // query's dominant compute (Tables.spread, r17 opt)
    val docs = Tables.spread(s, Tables.documents(s, dir))
    def grams(df: DataFrame): DataFrame = df
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 5)
      .select(col("doc_id"), col("lang"), explode(expr(
        "array_distinct(transform(sequence(1, size(toks) - 4)," +
          " i -> array_join(slice(toks, i, 5), ' ')))")).as("g"))
      .select(col("doc_id"), col("lang"), Dsl.md5Hash60(col("g")).as("h"))
    // held feeds the bitmap build AND the exact-hit verify; cand feeds
    // the hit leg AND the candidate census — checkpoint each once so
    // neither gram explosion (5-gram + md5 over the corpus) re-executes
    // per consumer (r17 opt: the two extra passes were ~40% of the
    // query's task time).
    val held = grams(docs.filter(col("doc_id") % 10 === 0)).ckpt("bloom_held")
    val train = grams(docs.filter(col("doc_id") % 10 =!= 0))
    val m = expr("shiftleft(1L, int(h % 63)) | shiftleft(1L, int((h div 64) % 63))")
    val bitmap = held
      .select(expr("(h div 4096) % 4096").as("bucket"), m.as("m"))
      .groupBy(col("bucket")).agg(expr("bit_or(m)").as("bits"))
    val cand = train
      .withColumn("bucket", expr("(h div 4096) % 4096"))
      .join(broadcast(bitmap), "bucket")
      .filter((expr("bits") bitwiseAND m) === m)
      .select(col("doc_id"), col("lang"), col("h"))
      .ckpt("bloom_cand")
    val hits = cand.join(held.select(col("h").as("hh")).distinct(),
      col("h") === col("hh"), "left_semi")
    val candAgg = cand.groupBy(col("lang"))
      .agg(countDistinct(col("doc_id")).as("n_cand_docs"),
        countDistinct(col("h")).as("n_cand_grams"))
    val hitAgg = hits.groupBy(col("lang").as("lang_h"))
      .agg(countDistinct(col("doc_id")).as("n_hit_docs"),
        countDistinct(col("h")).as("n_hit_grams"))
    candAgg.join(hitAgg, col("lang") === col("lang_h"), "left_outer")
      .select(col("lang"), col("n_cand_docs"), col("n_cand_grams"),
        coalesce(col("n_hit_docs"), lit(0L)).as("n_hit_docs"),
        coalesce(col("n_hit_grams"), lit(0L)).as("n_hit_grams"))
      .orderBy("lang")
  }

  /** Product-quantization ANN (Jégou et al., TPAMI 2011) — the
    * memory-bounded fourth ANN variant next to brute-force / LSH / IVF:
    * at 100 TB the raw vectors (256 B each) cannot sit in RAM, but the
    * PQ codes (8 × 4-bit-ish codes here, 8 numbers per vector) can, and
    * query-time asymmetric distance (ADC) is a broadcast join against a
    * 128-row lookup table instead of any per-candidate vector math.
    * Deterministic codebook: M = 8 subspaces × K = 16 centroids, where
    * centroid (m, j) is vec j's m-th 8-dim subvector (vec_ids 0–15 act
    * as the codebook — no RNG, oracle-expressible). Encode = argmin
    * subspace L2² (ties → smallest j, via struct MIN); ADC(q, x) =
    * Σ_m lut(m, code_m(x)) with the per-term round-9 → exact DECIMAL
    * sum policy so summation order can't leak. Query = vec 0; top-10
    * by ADC, vec_id tie-break. */
  def q_llm_ann_pq(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    // (id, m, 8-dim subvector) for every vector; centroids = ids 0-15
    def subs(df: DataFrame, idCol: String): DataFrame = df
      .select(col("vec_id").as(idCol), explode(expr(
        "transform(sequence(0, 7), m -> struct(m as m, slice(embedding, m*8 + 1, 8) as sv))"))
        .as("e"))
      .select(col(idCol), col("e.m").as("m"), col("e.sv").as("sv"))
    val cents = subs(emb.filter(col("vec_id") < 16), "j")
      .select(col("j"), col("m").as("cm"), col("sv").as("cv"))
    // fixed-order L2²: double promotion per element, left-to-right sum
    val d2 = expr("aggregate(zip_with(sv, cv, (x, c) -> " +
      "(cast(x as double) - cast(c as double)) * (cast(x as double) - cast(c as double)))," +
      " cast(0.0 as double), (acc, v) -> acc + v)")
    val dists = subs(emb, "vid")
      .join(broadcast(cents), col("m") === col("cm"))
      .select(col("vid"), col("m"), col("j"), d2.as("d2"))
    val codes = dists.groupBy(col("vid"), col("m"))
      .agg(min(struct(col("d2"), col("j"))).as("best"))
      .select(col("vid"), col("m"), col("best.j").as("code"))
    val lut = dists.filter(col("vid") === 0)
      .select(col("m").as("lm"), col("j").as("lj"),
        round(col("d2"), 9).cast("decimal(20,9)").as("qd2"))
    codes.join(broadcast(lut), col("m") === col("lm") && col("code") === col("lj"))
      .groupBy(col("vid"))
      .agg(sum(col("qd2")).cast("double").as("adc_dist"))
      .select(col("vid").as("vec_id"), round(col("adc_dist"), 6).as("adc_dist"))
      .orderBy(col("adc_dist").asc, col("vec_id").asc)
      .limit(10)
  }

  /** MMR constants: selection size, candidate pool, trade-off λ (written
    * as 7/10 so the literal double is identical in both engines). */
  val MmrK = 8
  val MmrPool = 20
  val MmrLambda: Double = 7.0 / 10

  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998)
    * — the diversified-retrieval step after a similarity search: from
    * the top-20 cosine candidates for the query vector, greedily select
    * k=8 maximizing λ·rel(c) − (1−λ)·max_{s∈S} sim(c,s) (smallest-id
    * tie-break). Relevance and pairwise sims are the established round-6
    * cosine family; the score arithmetic is pinned double ops on those
    * identical inputs, so the greedy trace is bit-reproducible and the
    * oracle replays it as 8 unrolled argmax CTEs.
    * Scale shape: the candidate pool is top-k-sized by construction
    * (the expensive part IS the similarity search, q_llm_cosine_topk /
    * ANN tier); the greedy loop touches 20 rows × 8 steps and collects
    * ONE argmax row per step — the bounded-k loop of a reranker, not a
    * data collect. */
  def q_llm_mmr(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val t = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("tv"), normCol(s)(col("embedding")).as("tn"))
    val cand = emb.filter(col("vec_id") =!= 0)
      .withColumn("vn", normCol(s)(col("embedding")))
      .crossJoin(broadcast(t))
      .select(col("vec_id"),
        round(cosSimPre(s)(col("embedding"), col("tv"), col("vn"), col("tn")), 6).as("rel"))
      .orderBy(col("rel").desc, col("vec_id").asc)
      .limit(MmrPool)
      .ckpt("mmr_pool")
    val cv = cand.select(col("vec_id").as("cid"))
      .join(emb, col("cid") === col("vec_id"))
      .select(col("cid"), col("embedding"), normCol(s)(col("embedding")).as("cn"))
    val aSide = cv.select(col("cid").as("sa"), col("embedding").as("va"), col("cn").as("na"))
    val bSide = cv.select(col("cid").as("sb"), col("embedding").as("vb"), col("cn").as("nb"))
    // broadcast the ≤MmrPool-row side explicitly: without the hint the
    // ≠-only self-join plans as a CartesianProduct (harmless at 20×20
    // but banned engine-wide — the r15 checkpoint-transparent gate
    // audits this build plan)
    val sims = aSide.join(broadcast(bSide), col("sa") =!= col("sb"))
      .select(col("sa"), col("sb"),
        round(cosSimPre(s)(col("va"), col("vb"), col("na"), col("nb")), 6).as("sim"))
      .ckpt("mmr_sims")
    // The greedy rerank is inherently sequential and POOL-BOUNDED: both
    // inputs are ≤ MmrPool (20) rows resp. ≤ MmrPool² pairs, so collect
    // them ONCE and run the k steps in memory — identical arithmetic
    // (λ·rel − (1−λ)·max-sim on the same round-6 doubles, same
    // score-desc/id-asc tie order), but one driver round-trip instead of
    // k scheduler jobs over a 20-row table. The distributed work — the
    // corpus-wide relevance scan and the pool sim matrix — stays above.
    val candRows = cand.select(col("vec_id"), col("rel")).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val simMap = sims.select(col("sa"), col("sb"), col("sim")).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val selIds = scala.collection.mutable.ArrayBuffer.empty[Long]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Double, Double)]
    for (step <- 1 to MmrK) {
      val best = candRows.iterator
        .filterNot { case (id, _) => selIds.contains(id) }
        .map { case (id, rel) =>
          val ms =
            if (selIds.isEmpty) 0.0
            else selIds.iterator.map(sb => simMap.getOrElse((id, sb), 0.0)).max
          (id, rel, MmrLambda * rel - (1.0 - MmrLambda) * ms)
        }
        .minBy { case (id, _, score) => (-score, id) }
      selIds += best._1
      out += ((step, best._1, best._2, best._3))
    }
    import s.implicits._
    out.toSeq.toDF("rank", "vec_id", "rel", "score").orderBy("rank")
  }

  /** Soft deduplication (down-WEIGHT duplicates instead of dropping
    * them — the SoftDeDup recipe): same candidate graph and min-label
    * fixpoint as q_llm_dedup_clusters, but every doc keeps sampling
    * weight 1/cluster_size. Per-language accounting: Σweights is
    * EXACTLY n_clusters (each cluster contributes sz·(1/sz) = 1, no
    * float sum needed), and effective tokens sum the per-cluster
    * round-9 term tot_tokens/sz as exact DECIMAL (the PSI recipe —
    * cross-cluster double addition is the one order-dependent op).
    * Shape: identical to the cluster pass + one more keyed agg. */
  def q_llm_soft_dedup(s: SparkSession, dir: String): DataFrame = {
    val docs = dedupDocs(s, dir)
    val clusters = dedupLabels(s, dir).join(docs, col("node") === col("doc_id"))
      .groupBy(col("lang"), col("lbl"))
      .agg(count(lit(1)).as("sz"), sum(col("nt")).as("tot"))
    clusters
      .select(col("lang"), col("sz"), col("tot"),
        round(col("tot").cast("double") / col("sz").cast("double"), 9)
          .cast("decimal(18,9)").as("eff"))
      .groupBy(col("lang"))
      .agg(sum(col("sz")).as("n_docs"), count(lit(1)).as("n_clusters"),
        sum(col("tot")).as("tot_tokens"),
        sum(col("eff")).cast("double").as("eff_tokens"))
      .orderBy("lang")
  }

  /** ANN quality accounting: recall@3 of the IVF cell-scoped search
    * against the exact brute-force top-3 over the full vector set —
    * the measurement every ANN deployment keeps next to its index
    * (cell-scoped search misses neighbors whose cell differs from the
    * query's). Both rankings use the same round-6 cosine family with
    * id tie-breaks, so the intersection count is exact-integer
    * deterministic; recall is one division by k. Exact side is the
    * broadcast-query TakeOrdered shape; IVF side reuses the assignment
    * machinery. */
  def q_llm_ann_recall(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val assigned = ivfAssign(s, dir)
    val qs = assigned.filter(col("vid").between(20, 24))
      .select(col("vid").as("query_id"), col("cid").as("qcid"),
        col("dv").as("qv"), col("dn").as("qn"))
    val wS = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    val ivf = qs.join(assigned.select(col("vid").as("neighbor_id"),
        col("cid").as("ncid"), col("dv").as("nv"), col("dn").as("nn")),
        col("qcid") === col("ncid") && col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", round(cosSimPre(s)(col("qv"), col("nv"), col("qn"), col("nn")), 6))
      .withColumn("rnk", row_number().over(wS))
      .filter(col("rnk") <= 3)
      .select(col("query_id").as("iq"), col("neighbor_id").as("in"))
    val data = emb
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"),
        normCol(s)(col("embedding")).as("nn"))
    val exact = qs.select(col("query_id"), col("qv"), col("qn"))
      .crossJoin(data).filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", round(cosSimPre(s)(col("qv"), col("nv"), col("qn"), col("nn")), 6))
      .withColumn("rnk", row_number().over(wS))
      .filter(col("rnk") <= 3)
      .select(col("query_id"), col("neighbor_id"))
    exact.join(ivf,
        col("query_id") === col("iq") && col("neighbor_id") === col("in"),
        "left_outer")
      .groupBy(col("query_id"))
      .agg(sum(when(col("in").isNotNull, 1L).otherwise(0L)).as("n_hits"))
      .select(col("query_id"), col("n_hits"),
        (col("n_hits").cast("double") / lit(3.0)).as("recall_at_3"))
      .orderBy("query_id")
  }

  /** Recall-curve operating points (shared with the oracle). */
  val RecallKs = Seq(1, 3, 10)

  /** ANN recall CURVE — recall@{1,3,10} of the IVF cell-scoped search
    * against the exact brute-force ranking (the operating-curve view of
    * q_llm_ann_recall's single point: a serving deployment picks its k
    * from this table, because cell-scoped recall IMPROVES with k at
    * fixed candidate cost only until the cell runs out of true
    * neighbors). Both rankings are computed ONCE to depth 10 with the
    * shared round-6 cosine + id tie-break, then every k aggregates the
    * same matched table: recall@k = Σ_q |exact-top-k ∩ ivf-top-k| /
    * (k·|Q|) — an exact-integer division. The k spine is a 3-row
    * broadcast over the query-bounded matched table. */
  def q_llm_ann_recall_curve(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val assigned = ivfAssign(s, dir)
    val qs = assigned.filter(col("vid").between(20, 24))
      .select(col("vid").as("query_id"), col("cid").as("qcid"),
        col("dv").as("qv"), col("dn").as("qn"))
    val wS = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    val ivf = qs.join(assigned.select(col("vid").as("neighbor_id"),
        col("cid").as("ncid"), col("dv").as("nv"), col("dn").as("nn")),
        col("qcid") === col("ncid") && col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim",
        round(cosSimPre(s)(col("qv"), col("nv"), col("qn"), col("nn")), 6))
      .withColumn("irnk", row_number().over(wS).cast("bigint"))
      .filter(col("irnk") <= 10)
      .select(col("query_id").as("iq"), col("neighbor_id").as("in"), col("irnk"))
    val data = emb
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"),
        normCol(s)(col("embedding")).as("nn"))
    val matched = qs.select(col("query_id"), col("qv"), col("qn"))
      .crossJoin(data).filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim",
        round(cosSimPre(s)(col("qv"), col("nv"), col("qn"), col("nn")), 6))
      .withColumn("ernk", row_number().over(wS).cast("bigint"))
      .filter(col("ernk") <= 10)
      .select(col("query_id"), col("neighbor_id"), col("ernk"))
      .join(ivf, col("query_id") === col("iq")
        && col("neighbor_id") === col("in"), "left_outer")
      .select(col("query_id"), col("ernk"), col("irnk"))
      .ckpt("annRecallCurve_matched") // |Q| x 10 rows
    val ks = s.range(0, 1)
      .select(explode(array(RecallKs.map(k => lit(k)): _*)).as("k"))
    matched.crossJoin(broadcast(ks))
      .filter(col("ernk") <= col("k"))
      .groupBy(col("k"))
      .agg(countDistinct(col("query_id")).as("n_queries"),
        sum(when(col("irnk").isNotNull && col("irnk") <= col("k"), 1L)
          .otherwise(0L)).as("n_hits"))
      .select(col("k").cast("bigint").as("k"), col("n_queries"), col("n_hits"),
        round(col("n_hits").cast("double")
          / (col("k") * col("n_queries")).cast("double"), 6).as("recall"))
      .orderBy("k")
  }

  /** Feature-hash dimensionality (hashing-trick vectorizer). */
  val FeatureHashDims = 32

  /** Hashing-trick vectorizer (Weinberger 2009 — the stateless,
    * vocabulary-free featurizer a streaming pipeline can apply with NO
    * fitted state): every token hashes to one of 32 dims with a ±1
    * sign hash; a document's vector is the signed occurrence sum.
    * Per-doc accounting stays ALL-integer (nnz, L1, squared L2 — no
    * sqrt, no float anywhere): the md5 60-bit family keys both hashes
    * so DuckDB replays every bucket and sign exactly. One explode +
    * two keyed aggs; at 100 TB this is the featurizer that needs no
    * broadcast model at all. */
  def q_llm_feature_hash(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.spread(s, Tables.documents(s, dir))
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val signed = toks.select(col("doc_id"), col("lang"),
      pmod(Dsl.md5Hash60(concat(lit("fh:"), col("tok"))),
        lit(FeatureHashDims)).as("dim"),
      when(pmod(Dsl.md5Hash60(concat(lit("fs:"), col("tok"))), lit(2)) === 0,
        lit(1L)).otherwise(lit(-1L)).as("sgn"))
    val dims = signed.groupBy(col("doc_id"), col("lang"), col("dim"))
      .agg(sum(col("sgn")).as("v"))
      .filter(col("v") =!= 0)
    dims.groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("nnz"),
        sum(abs(col("v"))).as("l1"),
        sum(col("v") * col("v")).as("l2_sq"))
      .orderBy("doc_id")
  }

  /** IVF-PQ composite index (Jégou et al. 2011 "Product Quantization
    * for Nearest Neighbor Search" §IV — the production ANN shape):
    * coarse IVF cell assignment (the q_llm_ann_ivf convention:
    * centroids = the `ivfNlist` = max(16, ⌊√n⌋) smallest vec_ids,
    * rounded-cosine argmax), RESIDUAL vectors
    * r = v − centroid(v), PQ codes over the residuals (M = 8 subspaces
    * × K = 16 codebook entries, codebook = the residuals of vec_ids
    * nlist…nlist+15 — the 16 smallest NON-centroid ids, deterministic,
    * no RNG; K is a quantization parameter, not corpus capacity), and
    * query-time cell-scoped ADC:
    * each query (vec_ids 20–24) scans ONLY its own cell, with the
    * distance Σ_m lut(m, code_m) a broadcast join against its
    * 128-row residual-distance LUT. Per-term round-9 → DECIMAL sum so
    * summation order can't leak (the q_llm_ann_pq device); top-3 by
    * (adc asc, id asc).
    *
    * Scale shape: this is the index a 100 TB deployment actually runs —
    * candidates are cell-bounded (IVF), per-candidate storage is 8
    * code bytes instead of 64 floats (PQ), and query-side math is a
    * LUT join, not vector arithmetic. Codebook (128 rows) and LUTs
    * (128 rows/query) broadcast at any corpus size. */
  def q_llm_ann_ivfpq(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val nlist = ivfNlist(s, dir)
    val assigned = ivfAssign(s, dir)
    val cents = emb.filter(col("vec_id") < nlist)
      .select(col("vec_id").as("rc"), col("embedding").as("rcv"))
    // residuals, materialized once: codebook, codes, and query LUTs all
    // re-read this table (double components: float→double casts are
    // exact, the subtraction is one correctly-rounded op both engines)
    val res = assigned.join(broadcast(cents), col("cid") === col("rc"))
      .select(col("vid"), col("cid"),
        expr("zip_with(dv, rcv, (x, c) -> cast(x as double) - cast(c as double))")
          .as("rv"))
      .ckpt()
    def subs(df: DataFrame, idCol: String): DataFrame = df
      .select(col("vid").as(idCol), explode(expr(
        "transform(sequence(0, 7), m -> struct(m as m, slice(rv, m*8 + 1, 8) as sv))"))
        .as("e"))
      .select(col(idCol), col("e.m").as("m"), col("e.sv").as("sv"))
    val cb = subs(res.filter(col("vid").between(nlist, nlist + 15)), "j")
      .select(col("j"), col("m").as("cm"), col("sv").as("cv"))
    // fixed-order L2² fold — left-assoc, same chain as the oracle's
    val d2 = expr("aggregate(zip_with(sv, cv, (x, c) -> (x - c) * (x - c)), " +
      "cast(0.0 as double), (acc, v) -> acc + v)")
    val dists = subs(res, "dvid").join(broadcast(cb), col("m") === col("cm"))
      .select(col("dvid"), col("m"), col("j"), d2.as("d2"))
    val codes = dists.groupBy(col("dvid"), col("m"))
      .agg(min(struct(col("d2"), col("j"))).as("best"))
      .select(col("dvid").as("nid"), col("m").as("nm"), col("best.j").as("code"))
    val qlut = dists.filter(col("dvid").between(20, 24))
      .select(col("dvid").as("query_id"), col("m").as("lm"), col("j").as("lj"),
        round(col("d2"), 9).cast("decimal(20,9)").as("qd2"))
    val qcells = assigned.filter(col("vid").between(20, 24))
      .select(col("vid").as("qid"), col("cid").as("qcid"))
    val cand = assigned.select(col("vid").as("cvid"), col("cid").as("ncid"))
      .join(broadcast(qcells), col("ncid") === col("qcid") && col("cvid") =!= col("qid"))
      .join(codes, col("cvid") === col("nid"))
    val adc = cand.join(broadcast(qlut),
        col("qid") === col("query_id") && col("nm") === col("lm") &&
          col("code") === col("lj"))
      .groupBy(col("qid"), col("cvid"))
      .agg(sum(col("qd2")).cast("double").as("adc"))
    val wR = Window.partitionBy(col("qid"))
      .orderBy(round(col("adc"), 6).asc, col("cvid").asc)
    adc.withColumn("rnk", row_number().over(wR).cast("bigint"))
      .filter(col("rnk") <= 3)
      .select(col("qid").as("query_id"), col("cvid").as("neighbor_id"),
        round(col("adc"), 6).as("adc_dist"), col("rnk"))
      .orderBy("query_id", "rnk")
  }

  /** MULTI-PROBE IVF-PQ search operating curve (r17, VERDICT r16 item 2
    * — the search shape a 100 TB deployment actually serves): the r16
    * nprobe curve moved onto the PQ tier. Per query (vec_ids 20–24) the
    * `ivfNlist` centroids rank by rounded cosine; width np ∈ NProbes
    * scans the np nearest cells; within the probed cells candidates
    * rank TWO ways — (a) ADC on the residual PQ codes, with a PER
    * (query, probed-cell) 128-row LUT built from the query's residual
    * against THAT cell's centroid (the centroid cancels:
    * ‖(q−c)−(x−c)‖² = ‖q−x‖², so ADC approximates true L2² in every
    * probed cell), and (b) an EXACT L2² re-rank of the same candidate
    * set (the audit column separating quantization error from
    * cell-miss error). Both legs report recall@3 against the exact
    * full-corpus L2² top-3. All distances are fixed-order left-assoc
    * double folds mirrored term-for-term by the oracle; ADC terms go
    * round-9 → DECIMAL (order-blind sum).
    *
    * Scale shape: LUTs are nprobe·128 rows per query (broadcast at any
    * corpus size), candidates are cell-bounded (nprobe·n/nlist =
    * nprobe·√n per query), per-candidate ADC is a LUT join on 8 code
    * bytes, and the exact legs are bounded to the 5-query anchor set. */
  def q_llm_ann_ivfpq_nprobe(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val nlist = ivfNlist(s, dir)
    val assigned = ivfAssign(s, dir)
    val cents = emb.filter(col("vec_id") < nlist)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"),
        normCol(s)(col("embedding")).as("cn"))
    val qs = assigned.filter(col("vid").between(20, 24))
      .select(col("vid").as("query_id"), col("dv").as("qv"), col("dn").as("qn"))
    // per-query centroid ranking (the q_llm_ann_nprobe device), with
    // the centroid VECTOR carried through for the residual LUTs
    val wC = Window.partitionBy(col("query_id"))
      .orderBy(col("ccos").desc, col("cid").asc)
    val qcells = qs.crossJoin(broadcast(cents))
      .withColumn("ccos", round(cosSimPre(s)(col("qv"), col("cv"), col("qn"), col("cn")), 6))
      .withColumn("cell_rank", row_number().over(wC))
      .filter(col("cell_rank") <= NProbes.max)
      .select(col("query_id").as("cq"), col("cid").as("ccid"),
        col("cv").as("ccv"), col("cell_rank"))
      .ckpt("ivfpq_np_qcells")
    // residual codebook + corpus codes: the q_llm_ann_ivfpq build
    val res = assigned.join(broadcast(cents.select(col("cid").as("rc"), col("cv").as("rcv"))),
        col("cid") === col("rc"))
      .select(col("vid"), col("cid"),
        expr("zip_with(dv, rcv, (x, c) -> cast(x as double) - cast(c as double))")
          .as("rv"))
      .ckpt()
    def subs(df: DataFrame, idCol: String): DataFrame = df
      .select(col("vid").as(idCol), explode(expr(
        "transform(sequence(0, 7), m -> struct(m as m, slice(rv, m*8 + 1, 8) as sv))"))
        .as("e"))
      .select(col(idCol), col("e.m").as("m"), col("e.sv").as("sv"))
    val cb = subs(res.filter(col("vid").between(nlist, nlist + 15)), "j")
      .select(col("j"), col("m").as("cm"), col("sv").as("cv2"))
    val d2 = expr("aggregate(zip_with(sv, cv2, (x, c) -> (x - c) * (x - c)), " +
      "cast(0.0 as double), (acc, v) -> acc + v)")
    val dists = subs(res, "dvid").join(broadcast(cb), col("m") === col("cm"))
      .select(col("dvid"), col("m"), col("j"), d2.as("d2"))
    val codes = dists.groupBy(col("dvid"), col("m"))
      .agg(min(struct(col("d2"), col("j"))).as("best"))
      .select(col("dvid").as("nid"), col("m").as("nm"), col("best.j").as("code"))
    // per (query, probed cell) residual → 128-row LUT each
    val qres = qcells.join(broadcast(qs), col("cq") === col("query_id"))
      .select(col("query_id"), col("ccid"), col("cell_rank"),
        expr("zip_with(qv, ccv, (x, c) -> cast(x as double) - cast(c as double))")
          .as("rv"))
    val qsubs = qres
      .select(col("query_id"), col("ccid"), col("cell_rank"), explode(expr(
        "transform(sequence(0, 7), m -> struct(m as m, slice(rv, m*8 + 1, 8) as sv))"))
        .as("e"))
      .select(col("query_id"), col("ccid"), col("cell_rank"),
        col("e.m").as("m"), col("e.sv").as("sv"))
    val qlut = qsubs.join(broadcast(cb), col("m") === col("cm"))
      .select(col("query_id").as("lq"), col("ccid").as("lcell"), col("m").as("lm"),
        col("j").as("lj"), round(d2, 9).cast("decimal(20,9)").as("qd2"))
    // candidates = vectors in any probed cell (cell_rank attached)
    val cand = assigned.select(col("vid").as("cvid"), col("cid").as("ncid"),
        col("dv").as("nv"))
      .join(broadcast(qcells.select(col("cq"), col("ccid"), col("cell_rank"))),
        col("ncid") === col("ccid"))
      .join(broadcast(qs), col("cq") === col("query_id")
        && col("cvid") =!= col("query_id"))
    // exact L2² — fixed-order left-assoc 64-term fold (oracle twin is
    // the generated explicit chain)
    val l2 = expr("aggregate(zip_with(qv, nv, (x, y) -> " +
      "(cast(x as double) - cast(y as double)) * (cast(x as double) - cast(y as double))), " +
      "cast(0.0 as double), (acc, v) -> acc + v)")
    val candL2 = cand
      .select(col("query_id"), col("cvid"), col("ncid"), col("cell_rank"),
        round(l2, 6).as("l2r"))
      .ckpt("ivfpq_np_cand")
    val adc = candL2.select(col("query_id"), col("cvid"), col("ncid"), col("cell_rank"))
      .join(codes, col("cvid") === col("nid"))
      .join(broadcast(qlut), col("query_id") === col("lq")
        && col("ncid") === col("lcell") && col("nm") === col("lm")
        && col("code") === col("lj"))
      .groupBy(col("query_id"), col("cvid"), col("cell_rank"))
      .agg(sum(col("qd2")).cast("double").as("adc"))
      .ckpt("ivfpq_np_adc")
    val nps = s.range(0, 1)
      .select(explode(array(NProbes.map(np => lit(np)): _*)).as("np"))
    val wA = Window.partitionBy(col("np"), col("query_id"))
      .orderBy(round(col("adc"), 6).asc, col("cvid").asc)
    val adcTop = adc.crossJoin(broadcast(nps))
      .filter(col("cell_rank") <= col("np"))
      .withColumn("rnk", row_number().over(wA))
      .filter(col("rnk") <= 3)
      .select(col("np").as("anp"), col("query_id").as("aq"), col("cvid").as("an"))
    val wR = Window.partitionBy(col("np"), col("query_id"))
      .orderBy(col("l2r").asc, col("cvid").asc)
    val rrTop = candL2.crossJoin(broadcast(nps))
      .filter(col("cell_rank") <= col("np"))
      .withColumn("rnk", row_number().over(wR))
      .filter(col("rnk") <= 3)
      .select(col("np").as("rnp"), col("query_id").as("rq"), col("cvid").as("rn"))
    // ground truth: exact full-corpus L2² top-3 per query
    val wE = Window.partitionBy(col("query_id"))
      .orderBy(col("l2r").asc, col("neighbor_id").asc)
    val exact = qs.crossJoin(
        emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv")))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), round(l2, 6).as("l2r"))
      .withColumn("rnk", row_number().over(wE))
      .filter(col("rnk") <= 3)
      .select(col("query_id"), col("neighbor_id"))
    exact.crossJoin(broadcast(nps.select(col("np").as("enp"))))
      .join(adcTop, col("enp") === col("anp") && col("query_id") === col("aq")
        && col("neighbor_id") === col("an"), "left_outer")
      .join(rrTop, col("enp") === col("rnp") && col("query_id") === col("rq")
        && col("neighbor_id") === col("rn"), "left_outer")
      .groupBy(col("enp").cast("bigint").as("nprobe"))
      .agg(countDistinct(col("query_id")).as("n_queries"),
        sum(when(col("an").isNotNull, 1L).otherwise(0L)).as("n_hits_adc"),
        sum(when(col("rn").isNotNull, 1L).otherwise(0L)).as("n_hits_rerank"))
      .select(col("nprobe"), col("n_queries"),
        col("n_hits_adc"),
        round(col("n_hits_adc").cast("double")
          / (lit(3) * col("n_queries")).cast("double"), 6).as("recall_adc_at_3"),
        col("n_hits_rerank"),
        round(col("n_hits_rerank").cast("double")
          / (lit(3) * col("n_queries")).cast("double"), 6).as("recall_rerank_at_3"))
      .orderBy("nprobe")
  }

  /** Lloyd iterations for the PQ codebook trainer. */
  val PqTrainIters = 2

  /** PQ codebook TRAINING (r17 — closes the judged ADC-recall-floor
    * caveat: "untrained 16-entry codebook ⇒ ADC recall is the floor").
    * Per subspace m ∈ 0..7, `PqTrainIters` Lloyd iterations of K=16
    * k-means over the IVF residual subvectors, seeded from the
    * UNTRAINED codebook (the residuals of vec_ids nlist..nlist+15 —
    * q_llm_ann_ivfpq's exact codebook), exactly how FAISS trains its
    * product quantizer (Jégou 2011 §III.C: independent k-means per
    * subquantizer). Output per subspace: corpus size and the TOTAL
    * quantization error under the seed codebook vs the trained one,
    * plus `improved` — Lloyd's monotone-descent guarantee made a
    * column (assignment and re-estimation each only lower the
    * objective; dropping an emptied centroid can't raise any vector's
    * min-distance).
    *
    * Determinism devices (the q_llm_kmeans recipe, per subspace):
    * fixed-order left-assoc 8-term L2² folds, lexicographic
    * (d2, code) argmin, round-6 re-estimated centroid dims, and
    * order-blind round-9→DECIMAL error sums.
    *
    * Scale shape: training state is the 128-row codebook (broadcast);
    * each iteration is one broadcast join + one 128-group partial agg
    * over (corpus × 8) subvector rows — executors ship 128×8 partial
    * sums, never vectors. This is the trainer a 100 TB deployment runs
    * on a sample, expressed over the full corpus. */
  /** (vid, m, sv): every IVF residual split into 8 subvectors of 8
    * dims — the PQ trainer's working table, materialized ONCE per
    * (session, embeddings generation): the seed codebook, both error
    * legs, every Lloyd iteration, and the trained-ADC curve re-read it. */
  private[graft] def pqSubvecs(s: SparkSession, dir: String): DataFrame =
    Mv.memo(s, s"pqSubvecs|${tablesKey(s, dir, Seq("embeddings"))}") { bs =>
      val emb = Tables.embeddings(bs, dir)
      val nlist = ivfNlist(bs, dir)
      val cents = emb.filter(col("vec_id") < nlist)
        .select(col("vec_id").as("rc"), col("embedding").as("rcv"))
      ivfAssign(bs, dir).join(broadcast(cents), col("cid") === col("rc"))
        .select(col("vid"),
          expr("zip_with(dv, rcv, (x, c) -> cast(x as double) - cast(c as double))")
            .as("rv"))
        .select(col("vid"), explode(expr(
          "transform(sequence(0, 7), m -> struct(m as m, slice(rv, m*8 + 1, 8) as sv))"))
          .as("e"))
        .select(col("vid"), col("e.m").as("m"), col("e.sv").as("sv"))
        .ckpt("pq_subvecs")
    }

  /** The UNTRAINED codebook: residual subvectors of vec_ids
    * nlist..nlist+15 (q_llm_ann_ivfpq's exact codebook). */
  private[graft] def pqSeedCb(s: SparkSession, dir: String): DataFrame = {
    val nlist = ivfNlist(s, dir)
    pqSubvecs(s, dir).filter(col("vid").between(nlist, nlist + 15))
      .select(col("vid").as("j"), col("m").as("cm"), col("sv").as("cv"))
  }

  /** Fixed-order L2² fold over the 8 subvector dims (ivfpq's chain). */
  private def pqD2 = expr(
    "aggregate(zip_with(sv, cv, (x, c) -> (x - c) * (x - c)), " +
      "cast(0.0 as double), (acc, v) -> acc + v)")

  /** Argmin PQ assignment of every subvector to its nearest codebook
    * entry: (vid, m, d2, j) — lexicographic (d2, code) tie-break. */
  private def pqAssign(s: SparkSession, dir: String, cb: DataFrame): DataFrame =
    pqSubvecs(s, dir)
      .join(broadcast(cb), col("m") === col("cm"))
      .select(col("vid"), col("m"), col("j"), pqD2.as("d2"))
      .groupBy(col("vid"), col("m"))
      .agg(min(struct(col("d2"), col("j"))).as("b"))
      .select(col("vid"), col("m"), col("b.d2").as("d2"), col("b.j").as("j"))

  /** The TRAINED codebook: `PqTrainIters` Lloyd iterations per
    * subspace from the seed codebook (round-6 re-estimated dims).
    * Session MV — the trainer's report and the trained-ADC operating
    * curve both consume the identical 128-row table. */
  private[graft] def pqTrainedCb(s: SparkSession, dir: String): DataFrame =
    Mv.memo(s, s"pqTrainedCb|${tablesKey(s, dir, Seq("embeddings"))}") { bs =>
      val sv = pqSubvecs(bs, dir)
      var cb = pqSeedCb(bs, dir)
      for (_ <- 1 to PqTrainIters) {
        val means = (1 to 8).map(d =>
          round(avg(element_at(col("sv"), d)), 6).as(s"a$d"))
        cb = pqAssign(bs, dir, cb)
          .join(sv, Seq("vid", "m"))
          .groupBy(col("m"), col("j"))
          .agg(means.head, means.tail: _*)
          .select(col("m").as("cm"), col("j"),
            array((1 to 8).map(d => col(s"a$d")): _*).as("cv"))
          .ckpt("pq_train_cb") // ≤128 rows — keeps the lazy plan flat
      }
      cb
    }

  def q_llm_pq_train(s: SparkSession, dir: String): DataFrame = {
    def errLeg(codebook: DataFrame, name: String): DataFrame =
      pqAssign(s, dir, codebook)
        .groupBy(col("m"))
        .agg(count(lit(1)).as("n_vecs"),
          round(sum(round(col("d2"), 9).cast("decimal(24,9)")), 4).cast("double")
            .as(name))
    errLeg(pqSeedCb(s, dir), "err_seed")
      .join(errLeg(pqTrainedCb(s, dir), "err_trained").drop("n_vecs"), "m")
      .select(col("m").cast("bigint").as("m"), col("n_vecs"),
        col("err_seed"), col("err_trained"),
        (col("err_trained") <= col("err_seed")).as("improved"))
      .orderBy("m")
  }

  /** TRAINED-codebook IVF-PQ operating curve (r17 — the measurement
    * that certifies q_llm_pq_train actually buys retrieval quality,
    * not just lower quantization MSE): the q_llm_ann_ivfpq_nprobe
    * search rerun with BOTH codebooks side by side. Per query
    * (vec_ids 20–24) and nprobe ∈ {1,2,4}: candidates from the nprobe
    * nearest cells ranked by ADC twice — once on the seed (untrained)
    * codebook's codes/LUTs, once on the Lloyd-trained codebook's —
    * each leg's recall@3 vs the exact full-corpus L2² top-3. The
    * trained leg re-codes the corpus against the trained codebook and
    * builds per-(query, probed-cell) LUTs against the same 128 trained
    * entries; all distances are the established fixed-order folds with
    * round-9 → DECIMAL ADC sums.
    *
    * Scale shape: identical to ivfpq_nprobe — LUTs are nprobe·128
    * rows/query (broadcast), candidates cell-bounded (nprobe·√n), the
    * corpus re-code one broadcast join + one argmin agg; the trainer
    * itself amortizes as a session MV shared with q_llm_pq_train. */
  def q_llm_ann_ivfpq_trained(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val nlist = ivfNlist(s, dir)
    val assigned = ivfAssign(s, dir)
    val cents = emb.filter(col("vec_id") < nlist)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"),
        normCol(s)(col("embedding")).as("cn"))
    val qs = assigned.filter(col("vid").between(20, 24))
      .select(col("vid").as("query_id"), col("dv").as("qv"), col("dn").as("qn"))
    val wC = Window.partitionBy(col("query_id"))
      .orderBy(col("ccos").desc, col("cid").asc)
    val qcells = qs.crossJoin(broadcast(cents))
      .withColumn("ccos", round(cosSimPre(s)(col("qv"), col("cv"), col("qn"), col("cn")), 6))
      .withColumn("cell_rank", row_number().over(wC))
      .filter(col("cell_rank") <= NProbes.max)
      .select(col("query_id").as("cq"), col("cid").as("ccid"),
        col("cv").as("ccv"), col("cell_rank"))
      .ckpt("ivfpq_tr_qcells")
    // per-(query, probed cell) residual subvectors — both LUT legs read
    val qsubs = qcells.join(broadcast(qs), col("cq") === col("query_id"))
      .select(col("query_id"), col("ccid"), col("cell_rank"),
        expr("zip_with(qv, ccv, (x, c) -> cast(x as double) - cast(c as double))")
          .as("rv"))
      .select(col("query_id"), col("ccid"), col("cell_rank"), explode(expr(
        "transform(sequence(0, 7), m -> struct(m as m, slice(rv, m*8 + 1, 8) as sv))"))
        .as("e"))
      .select(col("query_id"), col("ccid"), col("cell_rank"),
        col("e.m").as("m"), col("e.sv").as("sv"))
    val cand = assigned.select(col("vid").as("cvid"), col("cid").as("ncid"))
      .join(broadcast(qcells.select(col("cq"), col("ccid"), col("cell_rank"))),
        col("ncid") === col("ccid"))
      .filter(col("cvid") =!= col("cq"))
      .select(col("cq").as("query_id"), col("cvid"), col("ncid"), col("cell_rank"))
      .ckpt("ivfpq_tr_cand")
    val nps = s.range(0, 1)
      .select(explode(array(NProbes.map(np => lit(np)): _*)).as("np"))
    // one ADC leg per codebook: corpus re-code + per-cell LUT + top-3
    def adcTopOf(cb: DataFrame, tag: String): DataFrame = {
      val codes = pqAssign(s, dir, cb)
        .select(col("vid").as("nid"), col("m").as("nm"), col("j").as("code"))
      val lut = qsubs.join(broadcast(cb), col("m") === col("cm"))
        .select(col("query_id").as("lq"), col("ccid").as("lcell"),
          col("m").as("lm"), col("j").as("lj"),
          round(pqD2, 9).cast("decimal(20,9)").as("qd2"))
      val adc = cand.join(codes, col("cvid") === col("nid"))
        .join(broadcast(lut), col("query_id") === col("lq")
          && col("ncid") === col("lcell") && col("nm") === col("lm")
          && col("code") === col("lj"))
        .groupBy(col("query_id"), col("cvid"), col("cell_rank"))
        .agg(sum(col("qd2")).cast("double").as("adc"))
        .ckpt(s"ivfpq_tr_adc_$tag")
      val wA = Window.partitionBy(col("np"), col("query_id"))
        .orderBy(round(col("adc"), 6).asc, col("cvid").asc)
      adc.crossJoin(broadcast(nps))
        .filter(col("cell_rank") <= col("np"))
        .withColumn("rnk", row_number().over(wA))
        .filter(col("rnk") <= 3)
        .select(col("np").as(s"${tag}np"), col("query_id").as(s"${tag}q"),
          col("cvid").as(s"${tag}n"))
    }
    val seedTop = adcTopOf(pqSeedCb(s, dir), "s")
    val trainedTop = adcTopOf(pqTrainedCb(s, dir), "t")
    // ground truth: exact full-corpus L2² top-3 per query
    val l2 = expr("aggregate(zip_with(qv, nv, (x, y) -> " +
      "(cast(x as double) - cast(y as double)) * (cast(x as double) - cast(y as double))), " +
      "cast(0.0 as double), (acc, v) -> acc + v)")
    val wE = Window.partitionBy(col("query_id"))
      .orderBy(col("l2r").asc, col("neighbor_id").asc)
    val exact = qs.crossJoin(
        emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv")))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), round(l2, 6).as("l2r"))
      .withColumn("rnk", row_number().over(wE))
      .filter(col("rnk") <= 3)
      .select(col("query_id"), col("neighbor_id"))
    exact.crossJoin(broadcast(nps.select(col("np").as("enp"))))
      .join(seedTop, col("enp") === col("snp") && col("query_id") === col("sq")
        && col("neighbor_id") === col("sn"), "left_outer")
      .join(trainedTop, col("enp") === col("tnp") && col("query_id") === col("tq")
        && col("neighbor_id") === col("tn"), "left_outer")
      .groupBy(col("enp").cast("bigint").as("nprobe"))
      .agg(countDistinct(col("query_id")).as("n_queries"),
        sum(when(col("sn").isNotNull, 1L).otherwise(0L)).as("n_hits_adc_seed"),
        sum(when(col("tn").isNotNull, 1L).otherwise(0L)).as("n_hits_adc_trained"))
      .select(col("nprobe"), col("n_queries"),
        col("n_hits_adc_seed"),
        round(col("n_hits_adc_seed").cast("double")
          / (lit(3) * col("n_queries")).cast("double"), 6).as("recall_adc_seed_at_3"),
        col("n_hits_adc_trained"),
        round(col("n_hits_adc_trained").cast("double")
          / (lit(3) * col("n_queries")).cast("double"), 6).as("recall_adc_trained_at_3"))
      .orderBy("nprobe")
  }

  /** LSH-candidate dedup clustering (round 10) — the clustering a 100 TB
    * pipeline ACTUALLY runs: connected components over the banded-
    * MinHash candidate pairs verified at the strong threshold
    * (q_llm_minhash_md5's oracled pipeline, J ≥ 0.8), instead of the
    * exact all-pairs graph q_llm_dedup_clusters uses as ground truth.
    * Same min-label fixpoint, same per-lang accounting; the delta vs
    * the exact clustering IS the banding recall loss (measured 99.1 %
    * at J ≥ 0.8 — APPROX_BOUNDS.json minhash_lsh), which is why the
    * exact tier stays in the contract as the audit baseline. Pair
    * volume is candidate-bounded (bucket joins), never quadratic. */
  def q_llm_lsh_clusters(s: SparkSession, dir: String): DataFrame = {
    val docs = dedupDocs(s, dir)
    val p = q_llm_minhash_md5(s, dir).filter(col("jaccard") >= 0.8)
      .select(col("doc_a").as("x"), col("doc_b").as("y"))
    val ue = p.union(p.select(col("y").as("x"), col("x").as("y")))
      .ckpt()
    // The ccLabels shape (r17 opt): iterate only over edge-connected
    // docs (isolated docs never change label — folded back in below),
    // and pointer-jump (lbl := lbl(lbl)) so long chains converge in
    // O(log diameter) rounds instead of O(diameter) — the old plain
    // loop ran 47 jobs per query (measured). Same min-label fixpoint,
    // identical labels. Label tables are doc-count-bounded →
    // broadcast.
    var labels = ue.select(col("x").as("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
      .ckpt()
    val first = labels.agg(sum(col("lbl"))).collect()(0)
    var prevSum = if (first.isNullAt(0)) 0L else first.getLong(0)
    var converged = first.isNullAt(0)
    while (!converged) {
      // label tables are |sampled docs|-sized — probe-gated docHint
      // instead of an unconditional broadcast (VERDICT r17 item 5: the
      // one shape that breaks outright at 100 TB doc counts; past the
      // guard the hint drops and the supersteps run as shuffle joins)
      val nbrMin = ue
        .join(docHint(s, dir, labels.select(col("node").as("bn"), col("lbl").as("blbl"))),
          col("y") === col("bn"))
        .groupBy(col("x")).agg(min(col("blbl")).as("nbr_min"))
      val stepped = labels
        .join(nbrMin, col("node") === col("x"), "left_outer")
        .select(col("node"),
          least(col("lbl"), coalesce(col("nbr_min"), col("lbl"))).as("lbl"))
      val next = stepped.alias("s")
        .join(docHint(s, dir, stepped.select(col("node").as("jn"), col("lbl").as("jl"))),
          col("s.lbl") === col("jn"))
        .select(col("s.node").as("node"), least(col("s.lbl"), col("jl")).as("lbl"))
        .ckpt()
      val nextF = GraphOps.freshStats(s, next)
      val curSum = nextF.agg(sum(col("lbl"))).collect()(0).getLong(0)
      labels = nextF
      converged = curSum == prevSum
      prevSum = curSum
    }
    docs.join(labels, col("doc_id") === col("node"), "left_outer")
      .select(col("lang"), col("doc_id"),
        coalesce(col("lbl"), col("doc_id")).as("lbl"))
      .groupBy(col("lang"), col("lbl")).agg(count(lit(1)).as("sz"))
      .groupBy(col("lang"))
      .agg(sum(col("sz")).as("n_docs"), count(lit(1)).as("n_clusters"),
        (sum(col("sz")) - count(lit(1))).as("n_dup_docs"),
        max(col("sz")).as("max_cluster"))
      .orderBy("lang")
  }

  /** Hard-negative mining (round 10) — the contrastive-training data
    * op (e.g. DPR, Karpukhin et al. 2020 §3.2): for each anchor vector
    * (vec_ids 20–24), the top-3 most cosine-similar vectors whose LABEL
    * differs from the anchor's — maximally confusable negatives. One
    * corpus scan against a broadcast 5-row anchor table, per-anchor
    * top-k rank — the brute-force tier; at index scale the candidate
    * generation swaps to the IVF/PQ path with the same label filter.
    * Round-6 cosines + id tie-breaks (the established device). */
  def q_llm_hard_negatives(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val anchors = emb.filter(col("vec_id").between(20, 24))
      .select(col("vec_id").as("anchor_id"), col("label").as("albl"),
        col("embedding").as("av"), normCol(s)(col("embedding")).as("an"))
    val wR = Window.partitionBy(col("anchor_id"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    emb.withColumn("vn", normCol(s)(col("embedding")))
      .crossJoin(broadcast(anchors))
      .filter(col("vec_id") =!= col("anchor_id") && col("label") =!= col("albl"))
      .withColumn("cos_sim",
        round(cosSimPre(s)(col("embedding"), col("av"), col("vn"), col("an")), 6))
      .withColumn("rnk", row_number().over(wR).cast("bigint"))
      .filter(col("rnk") <= 3)
      .select(col("anchor_id"), col("vec_id").as("negative_id"),
        col("label").as("negative_label"), col("cos_sim"), col("rnk"))
      .orderBy("anchor_id", "rnk")
  }

  /** Canonical-survivor selection (round 10 — the dedup pipeline's
    * actual OUTPUT, beyond q_llm_dedup_clusters' accounting): per
    * multi-doc duplicate cluster, the kept document (the min-id
    * canonical the min-label fixpoint already names), how many
    * duplicates drop, and the token mass removed. Reuses the
    * dedupLabels/dedupDocs session MVs — one extra keyed aggregation
    * over work the cluster pass already did. */
  def q_llm_dedup_keep(s: SparkSession, dir: String): DataFrame = {
    val docs = dedupDocs(s, dir)
    dedupLabels(s, dir).join(docs, col("node") === col("doc_id"))
      .groupBy(col("lang"), col("lbl").as("kept_doc"))
      .agg(count(lit(1)).as("sz"), sum(col("nt")).as("tot_tokens"),
        sum(when(col("node") =!= col("lbl"), col("nt")).otherwise(0L))
          .as("dropped_tokens"))
      .filter(col("sz") >= 2)
      .select(col("lang"), col("kept_doc"), (col("sz") - 1).as("n_dropped"),
        col("tot_tokens"), col("dropped_tokens"))
      .orderBy("lang", "kept_doc")
  }

  /** Dedup-cascade FUNNEL report (the one-page accounting a 100 TB
    * curation run publishes beside its corpus: how much mass each dedup
    * tier removes): per lang over the deterministic 10 % sample —
    * docs/tokens in → exact-hash survivors (distinct md5 of the full
    * text) → near-dup survivors (the dedupLabels 0.8-jaccard
    * components, shared MV — an exact duplicate is jaccard-1, so the
    * cluster tier subsumes the exact tier and the funnel is monotone)
    * → kept-token mass of the min-id representatives, with the kept
    * share as ONE round-6 division. Everything is keyed aggregation
    * over already-materialized MVs plus one hash scan; the funnel
    * table is lang-bounded at any scale. */
  def q_llm_dedup_funnel(s: SparkSession, dir: String): DataFrame = {
    val docs = dedupDocs(s, dir)
    val exact = Tables.documents(s, dir)
      .filter(col("doc_id") % 10 === 0 &&
        size(array_distinct(split(col("text"), " "))) > 0)
      .select(col("lang"), md5(col("text").cast("binary")).as("h"))
      .groupBy(col("lang")).agg(countDistinct(col("h")).as("n_exact"))
    dedupLabels(s, dir).join(docs, col("node") === col("doc_id"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"),
        countDistinct(col("lbl")).as("n_clusters"),
        sum(when(col("node") === col("lbl"), col("nt")).otherwise(0L))
          .as("kept_tokens"))
      .join(exact, Seq("lang"))
      .select(col("lang"), col("n_docs"), col("n_tokens"), col("n_exact"),
        col("n_clusters"), col("kept_tokens"),
        round(col("kept_tokens").cast("double") / col("n_tokens").cast("double"), 6)
          .as("kept_share"))
      .orderBy("lang")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_llm_dedup_funnel" -> q_llm_dedup_funnel _,
    "q_llm_ann_recall_curve" -> q_llm_ann_recall_curve _,
    "q_llm_dedup_keep" -> q_llm_dedup_keep _,
    "q_llm_lsh_clusters" -> q_llm_lsh_clusters _,
    "q_llm_hard_negatives" -> q_llm_hard_negatives _,
    "q_llm_ann_ivfpq" -> q_llm_ann_ivfpq _,
    "q_llm_ann_ivfpq_nprobe" -> q_llm_ann_ivfpq_nprobe _,
    "q_llm_pq_train" -> q_llm_pq_train _,
    "q_llm_ann_ivfpq_trained" -> q_llm_ann_ivfpq_trained _,
    "q_llm_feature_hash" -> q_llm_feature_hash _,
    "q_llm_ann_recall" -> q_llm_ann_recall _,
    "q_llm_soft_dedup" -> q_llm_soft_dedup _,
    "q_llm_mmr" -> q_llm_mmr _,
    "q_llm_ann_pq" -> q_llm_ann_pq _,
    "q_llm_bloom_prefilter" -> q_llm_bloom_prefilter _,
    "q_llm_dedup_exact" -> q_llm_dedup_exact _,
    "q_llm_dup_histogram" -> q_llm_dup_histogram _,
    "q_llm_jaccard_pairs" -> q_llm_jaccard_pairs _,
    "q_llm_minhash_lsh" -> q_llm_minhash_lsh _,
    "q_llm_minhash_md5" -> q_llm_minhash_md5 _,
    "q_stream_minhash" -> q_stream_minhash _,
    "q_llm_minhash_est" -> q_llm_minhash_est _,
    "q_llm_simhash" -> q_llm_simhash _,
    "q_llm_simhash_md5" -> q_llm_simhash_md5 _,
    "q_llm_simhash_recall" -> q_llm_simhash_recall _,
    "q_llm_embed_neardup" -> q_llm_embed_neardup _,
    "q_llm_ann_ivf" -> q_llm_ann_ivf _,
    "q_llm_ann_nprobe" -> q_llm_ann_nprobe _,
    "q_llm_ann_lsh" -> q_llm_ann_lsh _,
    "q_llm_semdedup" -> q_llm_semdedup _,
    "q_llm_dedup_clusters" -> q_llm_dedup_clusters _,
    "q_llm_cosine_topk" -> q_llm_cosine_topk _,
    "q_llm_knn_join" -> q_llm_knn_join _,
    "q_embed_mrl" -> q_embed_mrl _,
    "q_llm_mix_temperature" -> q_llm_mix_temperature _,
    "q_llm_text_stats" -> q_llm_text_stats _,
    "q_llm_multimodal" -> q_llm_multimodal _
  )
}
