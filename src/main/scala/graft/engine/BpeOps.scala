package graft.engine

import graft.engine.Ckpt.CkptOps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Iterated BPE merge training (Sennrich et al. 2016 §3.2) — the actual
  * merge LOOP, not just the first-pair statistics (q_llm_bpe_pairs): 3
  * rounds of count-pairs → pick-top → greedy left-to-right merge →
  * renumber, entirely as relational algebra over a positional (doc, pos,
  * symbol) encoding. No driver-side token state: each round is one
  * lead-window pair count, a 1-row top-pair broadcast, and a
  * gaps-and-islands pass that reproduces greedy semantics exactly —
  * overlapping matches only arise for self-pairs (a,a), where a run of
  * k matches keeps the 1st, 3rd, … (odd ranks within the island).
  *
  * Scale: every window partitions by doc_id (the natural shard key of a
  * tokenizer-training corpus); the only global step is the pair-count
  * aggregation, whose output is vocabulary²-bounded and whose top-1 row
  * broadcasts. This is how BPE training distributes at corpus scale —
  * Spark's window machinery replaces the in-memory symbol list.
  */
object BpeOps {

  val BpeRounds = 3
  /** Char-prefix per doc fed to the trainer (bounds positional rows). */
  val BpePrefix = 200

  /** (doc_id, pos, sym) positional char encoding of one en doc_id%10
    * residue split (0 = train, 1 = held-out eval). */
  private def base(s: SparkSession, dir: String, residue: Int): DataFrame =
    Tables.spread(s, Tables.documents(s, dir))
      .filter(col("lang") === "en" && col("doc_id") % 10 === residue)
      .select(col("doc_id"),
        posexplode(split(substring(col("text"), 1, BpePrefix), "")))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("sym"))

  private def wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))

  /** Most frequent adjacent pair (deterministic tie-break) as a 1-row DF. */
  private def topPair(t: DataFrame): DataFrame =
    t.withColumn("nxt", lead(col("sym"), 1).over(wDoc))
      .filter(col("nxt").isNotNull)
      .groupBy(col("sym").as("a"), col("nxt").as("b")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("a").asc, col("b").asc).limit(1)

  /** Greedy left-to-right application of ONE merge pair (a 1-row DF with
    * columns a, b, …) — the mechanics both training (freshly-counted top
    * pair) and apply/encode (a trained pair) share.
    *
    * Every auxiliary index lives under the ONE (doc_id, pos) window: the
    * gaps-and-islands formulation (partition by (doc_id, ismatch) then
    * by (doc_id, ismatch, grp)) would cost an exchange+sort per distinct
    * partitioning — 3 extra shuffles of the positional table per round —
    * but "odd rank within a consecutive match run" is equally a running-
    * sum fact: with mc = running count of matches and base = mc at the
    * current run's first row (a running last_value over run starts,
    * carried only while inside a run), rank-in-run = mc − base + 1, so
    * valid ⇔ ismatch ∧ (mc − base) even. One hash exchange on doc_id,
    * every window pass reuses it. */
  private[graft] def applyMerge(t: DataFrame, pair: DataFrame): DataFrame = {
    val p = t.withColumn("nxt", lead(col("sym"), 1).over(wDoc))
    val m = p.crossJoin(broadcast(pair.select(col("a"), col("b"))))
      .withColumn("ismatch",
        coalesce(col("sym") === col("a") && col("nxt") === col("b"), lit(false)))
    val v = m
      .withColumn("mc",
        sum(when(col("ismatch"), 1L).otherwise(0L)).over(wDoc))
      .withColumn("runstart",
        col("ismatch") && !coalesce(lag(col("ismatch"), 1).over(wDoc), lit(false)))
      .withColumn("base",
        last(when(col("runstart"), col("mc")), ignoreNulls = true).over(wDoc))
      .withColumn("valid",
        col("ismatch") && (col("mc") - col("base")) % 2 === 0)
    val c = v.withColumn("consumed",
      coalesce(lag(col("valid"), 1).over(wDoc), lit(false)))
    c.filter(!col("consumed"))
      .select(col("doc_id"), col("pos"),
        when(col("valid"), concat(col("a"), col("b"))).otherwise(col("sym")).as("sym"))
      .withColumn("pos", row_number().over(wDoc))
      // checkpoint: bounds the per-round plan growth (and the next
      // round's pair count re-reads the merged table, not the chain)
      .ckpt("bpeMerge_round")
  }

  /** One training round: returns (merged sequence, 1-row top-pair DF). */
  private def mergeRound(t: DataFrame): (DataFrame, DataFrame) = {
    val top = topPair(t)
    (applyMerge(t, top), top)
  }

  /** The learned merge table (step, a, b, pair_count, n_symbols) as a
    * session MV — this is THE artifact a production tokenizer pipeline
    * persists (train once, encode everywhere): both the trainer output
    * query and the encoder consume it, so the 3-round train chain (the
    * 7-window-per-round gaps-and-islands fixpoint over the train split)
    * runs once per (session, fixture) instead of once per consumer.
    * BpeRounds rows — the checkpoint is merge-table-sized, not corpus-
    * sized. */
  def bpeMerges(s: SparkSession, dir: String): DataFrame =
    Mv.memo(s, s"bpeMerges|${LlmOps.docsKey(s, dir)}") { bs =>
      var t = base(bs, dir, 0)
      val rows = (1 to BpeRounds).map { i =>
        val (merged, top) = mergeRound(t)
        t = merged
        top.crossJoin(merged.agg(count(lit(1)).as("n_symbols")))
          .select(lit(i).as("step"), col("a"), col("b"),
            col("c").as("pair_count"), col("n_symbols"))
      }
      rows.reduce(_ unionByName _).ckpt("bpeMerges")
    }

  /** The learned merge table: per round, the merged pair, its count at
    * selection time, and the corpus symbol count after applying it. */
  def q_llm_bpe_train(s: SparkSession, dir: String): DataFrame =
    bpeMerges(s, dir).orderBy("step")

  /** Tokenizer ENCODE with the learned merges: the 3 trained pairs are
    * applied in training order to the held-out split (doc_id%10 = 1) —
    * the train → apply separation a production tokenizer pipeline has
    * (the merge table comes from the bpeMerges MV, so encode pays only
    * the eval-side window passes). Merges the eval corpus never
    * exhibits apply as no-ops (count unchanged), exactly like a real
    * encoder. Output tracks the eval symbol count after each applied
    * merge. */
  def q_llm_bpe_apply(s: SparkSession, dir: String): DataFrame = {
    val merges = bpeMerges(s, dir)
    var ev = base(s, dir, 1)
    val rows = (1 to BpeRounds).map { i =>
      val top = merges.filter(col("step") === i).select(col("a"), col("b"))
      ev = applyMerge(ev, top)
      top.crossJoin(ev.agg(count(lit(1)).as("n_symbols_eval")))
        .select(lit(i).as("step"), col("a"), col("b"), col("n_symbols_eval"))
    }
    rows.reduce(_ unionByName _).orderBy("step")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_llm_bpe_train" -> q_llm_bpe_train _,
    "q_llm_bpe_apply" -> q_llm_bpe_apply _
  )

  // ── DuckDB oracle: the 3 rounds unrolled, same islands arithmetic ────

  private def roundCtes(i: Int): String =
    s"""p$i AS (SELECT doc_id, pos, sym, lead(sym) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt FROM t${i - 1}),
       |top$i AS (SELECT sym AS a, nxt AS b, COUNT(*) AS c FROM p$i WHERE nxt IS NOT NULL
       |          GROUP BY 1, 2 ORDER BY c DESC, a ASC, b ASC LIMIT 1),
       |m$i AS (SELECT p.doc_id, p.pos, p.sym, t.a, t.b, t.c,
       |          COALESCE(p.sym = t.a AND p.nxt = t.b, false) AS ismatch
       |        FROM p$i p CROSS JOIN top$i t),
       |g$i AS (SELECT *, pos - ROW_NUMBER() OVER (PARTITION BY doc_id, ismatch ORDER BY pos) AS grp FROM m$i),
       |v$i AS (SELECT *, ismatch AND (ROW_NUMBER() OVER (PARTITION BY doc_id, ismatch, grp ORDER BY pos) % 2 = 1) AS valid FROM g$i),
       |c$i AS (SELECT *, COALESCE(lag(valid) OVER (PARTITION BY doc_id ORDER BY pos), false) AS consumed FROM v$i),
       |o$i AS (SELECT doc_id, pos, CASE WHEN valid THEN a || b ELSE sym END AS sym FROM c$i WHERE NOT consumed),
       |t$i AS MATERIALIZED (SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS pos, sym FROM o$i),
       |s$i AS (SELECT $i AS step, a, b, c AS pair_count,
       |          (SELECT COUNT(*) FROM t$i) AS n_symbols FROM top$i)""".stripMargin

  /** Apply-side merge block: e{i-1} → e{i} via the TRAIN chain's top$i. */
  private def applyCtes(i: Int): String =
    s"""pe$i AS (SELECT doc_id, pos, sym, lead(sym) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt FROM e${i - 1}),
       |me$i AS (SELECT p.doc_id, p.pos, p.sym, t.a, t.b,
       |          COALESCE(p.sym = t.a AND p.nxt = t.b, false) AS ismatch
       |        FROM pe$i p CROSS JOIN top$i t),
       |ge$i AS (SELECT *, pos - ROW_NUMBER() OVER (PARTITION BY doc_id, ismatch ORDER BY pos) AS grp FROM me$i),
       |ve$i AS (SELECT *, ismatch AND (ROW_NUMBER() OVER (PARTITION BY doc_id, ismatch, grp ORDER BY pos) % 2 = 1) AS valid FROM ge$i),
       |ce$i AS (SELECT *, COALESCE(lag(valid) OVER (PARTITION BY doc_id ORDER BY pos), false) AS consumed FROM ve$i),
       |oe$i AS (SELECT doc_id, pos, CASE WHEN valid THEN a || b ELSE sym END AS sym FROM ce$i WHERE NOT consumed),
       |e$i AS MATERIALIZED (SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS pos, sym FROM oe$i),
       |se$i AS (SELECT $i AS step, a, b,
       |          (SELECT COUNT(*) FROM e$i) AS n_symbols_eval FROM top$i)""".stripMargin

  private def baseCte(name: String, residue: Int): String =
    s"""$name AS MATERIALIZED (
       |  SELECT doc_id, generate_subscripts(string_split(substr(text, 1, $BpePrefix), ''), 1) AS pos,
       |         UNNEST(string_split(substr(text, 1, $BpePrefix), '')) AS sym
       |  FROM documents WHERE lang = 'en' AND doc_id % 10 = $residue)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_llm_bpe_train" -> {
      val rounds = (1 to BpeRounds).map(roundCtes).mkString(",\n")
      val sel = (1 to BpeRounds)
        .map(i => s"SELECT step, a, b, pair_count, n_symbols FROM s$i")
        .mkString(" UNION ALL ")
      s"""WITH ${baseCte("t0", 0)},
         |$rounds
         |$sel ORDER BY step""".stripMargin
    },

    "q_llm_bpe_apply" -> {
      val trainRounds = (1 to BpeRounds).map(roundCtes).mkString(",\n")
      val applyRounds = (1 to BpeRounds).map(applyCtes).mkString(",\n")
      val sel = (1 to BpeRounds)
        .map(i => s"SELECT step, a, b, n_symbols_eval FROM se$i")
        .mkString(" UNION ALL ")
      s"""WITH ${baseCte("t0", 0)},
         |${baseCte("e0", 1)},
         |$trainRounds,
         |$applyRounds
         |$sel ORDER BY step""".stripMargin
    }
  )
}
