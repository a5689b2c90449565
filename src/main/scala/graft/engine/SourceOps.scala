package graft.engine

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink format coverage (SURVEY.md §2.1): the engine's relational
  * surface is format-agnostic — the same query runs over parquet, CSV,
  * JSON-lines, and ORC scans. Each round-trip op WRITES a fixture table in
  * the target format (exercising the sink), reads it back with an explicit
  * schema (no inference pass — at 100 TB schema inference is a full extra
  * scan), and aggregates; the DuckDB oracle computes the same aggregate
  * from the original parquet, so the check proves the round trip is
  * lossless, not merely self-consistent.
  *
  * Scale notes: text formats are row-major and schema-free — no column
  * pruning or predicate pushdown reaches a CSV/JSON scan, so these paths
  * exist for INGEST (land once, convert to parquet), never for the hot
  * analytical path. The explicit-schema read keeps ingestion a single
  * pass. Ref: reference ingest surface, /root/reference/README.md:2.
  */
object SourceOps {

  /** Per-process scratch root (ADVICE r4): keyed by PID + start time so
    * two concurrent JVMs (bench + correctness harness, parallel CI) can
    * never race each other's SaveMode.Overwrite writes, and distinct
    * fixture dirs sharing a basename stay separated per process. Cleaned
    * by the OS tmp reaper; one JVM reuses its own root across queries
    * (that reuse is what the Overwrite mode is for). */
  private lazy val scratchRoot: String = {
    val rh = java.lang.management.ManagementFactory.getRuntimeMXBean
    s"${System.getProperty("java.io.tmpdir")}/graft_fmt-${rh.getName.takeWhile(_ != '@')}-${rh.getStartTime}"
  }

  /** Scratch dir per (format, fixture): overwritten on every run so the
    * check never reads a stale round-trip from a previous session.
    * `private[graft]` so specs can inspect the physical output (e.g. the
    * gzip test asserting real .gz part files). */
  private[graft] def scratch(fmt: String, dir: String): String =
    s"$scratchRoot/$fmt-${new java.io.File(dir).getName}"

  private val supplierSchema = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  /** CSV sink + scan round trip: supplier → headered CSV → explicit-schema
    * read → per-nation count + exact decimal balance sum. Doubles survive
    * the text round trip exactly (Spark writes shortest-round-trip repr). */
  def q_src_csv_roundtrip(s: SparkSession, dir: String): DataFrame = {
    val path = scratch("csv", dir)
    Tables.supplier(s, dir).write.mode(SaveMode.Overwrite)
      .option("header", "true").csv(path)
    s.read.schema(supplierSchema).option("header", "true").csv(path)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_suppliers"),
        Dsl.moneySum(col("s_acctbal")).as("sum_bal"))
      .orderBy("s_nationkey")
  }

  /** JSON-lines sink + scan round trip: orders projected to JSON-safe
    * types (the date collapses to its year — JSON has no date type, and
    * ingest pipelines carry epoch ints for exactly this reason), then
    * per-(year, status) counts + exact decimal revenue. */
  def q_src_json_roundtrip(s: SparkSession, dir: String): DataFrame = {
    val path = scratch("json", dir)
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice"), year(col("o_orderdate")).as("o_year"))
      .write.mode(SaveMode.Overwrite).json(path)
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_year", IntegerType)))
    s.read.schema(schema).json(path)
      .groupBy(col("o_year"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        Dsl.moneySum(col("o_totalprice")).as("sum_price"))
      .orderBy("o_year", "o_orderstatus")
  }

  /** ORC sink + scan round trip (the columnar alternative: pruning and
    * predicate pushdown DO apply here, unlike the text formats): lineitem
    * quantity/price slice with a pushed filter on the read-back side. */
  def q_src_orc_roundtrip(s: SparkSession, dir: String): DataFrame = {
    val path = scratch("orc", dir)
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_returnflag"))
      .write.mode(SaveMode.Overwrite).orc(path)
    s.read.orc(path)
      .filter(col("l_quantity") >= 25)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        Dsl.moneySum(col("l_extendedprice")).as("sum_price"))
      .orderBy("l_returnflag")
  }

  /** Hive-style partitioned parquet sink + partition-pruned scan: events
    * land partitioned by event_type (the 100 TB layout primitive — a
    * predicate on the partition column prunes directories, so the scan
    * reads 1/5th of the files, verified in PlanAuditSpec), then one
    * partition is read back and aggregated per day. The oracle aggregates
    * the ORIGINAL parquet, proving the partitioned round trip lossless. */
  def q_src_partitioned_sink(s: SparkSession, dir: String): DataFrame = {
    val path = scratch("part", dir)
    Tables.events(s, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .write.mode(SaveMode.Overwrite).partitionBy("event_type").parquet(path)
    s.read.parquet(path)
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        Dsl.moneySum(col("value")).as("val_sum"))
      .orderBy("day")
  }

  /** File count the z-order layout evaluator packs rows into, and the
    * per-dimension bit width of the interleave. */
  val ZFiles = 64
  val ZBits = 16

  /** Bit-interleaved (Morton/Z-order) key of two ZBits-wide dimensions
    * — pure integer shifts/masks, bit-identical in DuckDB. */
  private def zValue(x: org.apache.spark.sql.Column,
      y: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (0 until ZBits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** Z-ORDER layout evaluator (the Delta/Iceberg `ZORDER BY` decision
    * tool): packs the event table into ZFiles equal files two ways —
    * insertion order (event_id) vs Morton order on (user_id, day) —
    * records each file's user_id min/max zone map, and probes both
    * layouts with a user-range predicate (the lowest user decile).
    * `files_hit` = files whose zone map intersects the probe = the
    * files a min/max-pruning scan must read. On a clustered layout the
    * ratio collapses toward the selectivity; on insertion order every
    * file spans the full key range and nothing prunes — THE quantified
    * argument for re-clustering before a 100 TB scan-heavy workload.
    * File assembly uses Dist.ntile (no single-partition sort); all
    * counts exact integers, one round-6 ratio per layout. */
  def q_src_zorder_layout(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("event_id"), col("user_id"),
      datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
        .cast("bigint").as("day"))
    val mask = (1L << ZBits) - 1
    val withZ = ev.withColumn("zv",
      zValue(col("user_id").bitwiseAND(lit(mask)),
        col("day").bitwiseAND(lit(mask))))
    // probe = the lowest user decile, derived from the data so the
    // band is non-degenerate at every sf (1-row driver scalar). The
    // zone-map check is TWO-sided (ADVICE r13: a one-sided mn <= hi is
    // correct only when the band starts at the global minimum — which
    // this one does, but the probe generalizes to any [lo, hi] band).
    val bounds = ev.agg(min(col("user_id")), max(col("user_id"))).collect()(0)
    val probeLo = bounds.getLong(0)
    val probeHi = bounds.getLong(1) / 10L
    def layout(name: String, order: Seq[org.apache.spark.sql.Column]) =
      Dist.ntile(withZ, ZFiles, order, "file_id")
        .groupBy(col("file_id"))
        .agg(min(col("user_id")).as("mn"), max(col("user_id")).as("mx"),
          count(lit(1)).as("in_file"))
        .agg(count(lit(1)).as("n_files"),
          sum(when(col("mn") <= probeHi && col("mx") >= probeLo, 1L)
            .otherwise(0L)).as("files_hit"),
          sum(col("in_file")).as("n_rows"))
        .select(lit(name).as("layout"), col("n_files"), col("files_hit"),
          round(col("files_hit").cast("double") / col("n_files").cast("double"), 6)
            .as("hit_ratio"), col("n_rows"))
    layout("natural", Seq(col("event_id")))
      .unionAll(layout("zorder", Seq(col("zv"), col("event_id"))))
      .orderBy("layout")
  }

  /** Bucket count for the co-located join (both sides identical). */
  val JoinBuckets = 8

  /** The shuffle-free side of q_join_bucketed, exposed for the plan
    * audit: both fact tables are written bucketed + sorted on the join
    * key (Spark's bucketBy sink = the lakehouse layout a 100 TB
    * deployment maintains), then joined — the planner sees matching
    * bucket specs and emits a SortMergeJoin with NO Exchange on either
    * side. PlanAuditSpec asserts the zero-shuffle plan. */
  def bucketedJoin(s: SparkSession, dir: String): DataFrame = {
    val base = scratch("bucketed", dir)
    val tag = new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_")
    val (oTbl, lTbl) = (s"graft_bkt_orders_$tag", s"graft_bkt_lineitem_$tag")
    // Each table guarded independently (ADVICE r5): if a first
    // invocation dies between the two writes, the missing table is
    // re-created on the next call instead of failing confusingly.
    if (!s.catalog.tableExists(oTbl)) {
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .write.mode(SaveMode.Overwrite).option("path", s"$base/orders")
        .bucketBy(JoinBuckets, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(oTbl)
    }
    if (!s.catalog.tableExists(lTbl)) {
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
        .write.mode(SaveMode.Overwrite).option("path", s"$base/lineitem")
        .bucketBy(JoinBuckets, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(lTbl)
    }
    s.table(oTbl).join(s.table(lTbl), col("o_orderkey") === col("l_orderkey"))
  }

  /** Bucketed co-located join: the layout-aware join path. Writing both
    * fact tables bucketed on the join key trades one up-front shuffle
    * (at sink time) for EVERY subsequent join being exchange-free — the
    * decisive layout at 100 TB where the fact⋈fact shuffle dominates.
    * The aggregate is computed off the bucketed round trip; the oracle
    * computes it from the original parquet, proving the layout is
    * lossless, not merely self-consistent. */
  def q_join_bucketed(s: SparkSession, dir: String): DataFrame =
    bucketedJoin(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_lines"),
        countDistinct(col("o_orderkey")).as("n_orders"),
        sum(col("l_quantity").cast("bigint")).as("sum_qty"),
        Dsl.moneySum(col("l_extendedprice")).as("sum_price"))
      .orderBy("o_orderstatus")

  /** Parquet schema evolution: half the corpus is written with the old
    * 2-column schema, half with the widened 3-column schema, and ONE
    * mergeSchema scan reads both generations — rows from the old files
    * surface an explicit NULL for the added column (exactly how a
    * 100 TB lake absorbs schema drift without rewriting history). The
    * aggregate separates row counts from priced-row counts so the
    * oracle (replaying the generation split from the original parquet)
    * proves the merge is lossless AND null-faithful. */
  def q_src_schema_evolution(s: SparkSession, dir: String): DataFrame = {
    val base = scratch("evolve", dir)
    val o = Tables.orders(s, dir)
    o.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"))
      .write.mode(SaveMode.Overwrite).parquet(s"$base/gen0")
    o.filter(col("o_orderkey") % 2 === 1)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .write.mode(SaveMode.Overwrite).parquet(s"$base/gen1")
    s.read.option("mergeSchema", "true").parquet(s"$base/gen0", s"$base/gen1")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("o_totalprice").isNotNull, 1L).otherwise(0L)).as("n_priced"),
        Dsl.moneySum(col("o_totalprice")).as("sum_priced"))
      .orderBy("o_orderstatus")
  }

  /** Line-delimited text sink + scan round trip (round 7 — the rawest
    * interchange format; completes the text-format pair beside CSV/JSON):
    * documents flatten to one TAB-joined line each (doc_id, lang, text
    * with tab/newline sanitized to spaces — the line format's invariant),
    * read back through the `text` source and re-split. Per-lang doc
    * count, distinct-id count, and exact char mass must survive; the
    * oracle applies the same sanitize to the ORIGINAL table, so a lossy
    * round trip (line splits, encoding drift) breaks the hash. */
  def q_src_text_roundtrip(s: SparkSession, dir: String): DataFrame = {
    val path = scratch("text", dir)
    Tables.documents(s, dir)
      .select(concat_ws("\t", col("doc_id"), col("lang"),
        translate(col("text"), "\t\n", "  ")).as("value"))
      .write.mode(SaveMode.Overwrite).text(path)
    s.read.text(path)
      .select(split(col("value"), "\t", 3).as("f"))
      .select(element_at(col("f"), 1).cast("long").as("doc_id"),
        element_at(col("f"), 2).as("lang"),
        element_at(col("f"), 3).as("text"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("doc_id")).as("n_ids"),
        sum(length(col("text")).cast("bigint")).as("sum_chars"))
      .orderBy("lang")
  }

  /** binaryFile multimodal ingest (round 7 — the crawler→pipeline
    * boundary: one opaque file per media object, exactly what
    * `spark.read.format("binaryFile")` exists for): the sampled media
    * table (doc_id % 100 = 0) lands as `<kind>_<id>.bin` files written
    * from the executors, then the binaryFile source reads them back and
    * the payload identity is proven per kind — file count, exact byte
    * mass (the source's `length` column), distinct content hashes, id
    * range parsed from the path. The oracle replays every number from
    * the documents table, so a dropped/truncated/duplicated file breaks
    * the compare. Scale shape: the source lists files in parallel and
    * never materializes a payload before its partition needs it. */
  def q_src_binary_ingest(s: SparkSession, dir: String): DataFrame = {
    val path = scratch("bin", dir)
    val root = new java.io.File(path)
    def wipe(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(wipe)
      f.delete(); ()
    }
    if (root.exists()) wipe(root)
    root.mkdirs()
    Multimodal.mediaTable(s, dir)
      .filter(col("media_id") % 100 === 0)
      .foreachPartition { it: Iterator[MediaRow] =>
        it.foreach { m =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(path, s"${m.kind}_${m.media_id}.bin"),
            m.bytes)
        }
      }
    val re = "([a-z]+)_([0-9]+)\\.bin$"
    s.read.format("binaryFile").load(path)
      .select(regexp_extract(col("path"), re, 1).as("kind"),
        regexp_extract(col("path"), re, 2).cast("long").as("media_id"),
        col("length"), md5(col("content")).as("h"))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_files"),
        sum(col("length")).as("sum_bytes"),
        countDistinct(col("h")).as("n_distinct"),
        min(col("media_id")).as("min_id"), max(col("media_id")).as("max_id"))
      .orderBy("kind")
  }

  /** GZIP-compressed text round trip (round 10 — the compressed-lines
    * format the web-corpus world actually ships: .jsonl.gz / .txt.gz):
    * the q_src_text_roundtrip line format written with
    * `compression=gzip`, read back through the text source's transparent
    * codec detection (.gz extension). Same per-lang invariants as the
    * plain-text trip (count, distinct ids, exact char mass), so the two
    * queries share one oracle; a codec corruption, truncated member, or
    * line split breaks the hash. Scale note: gzip is NOT splittable —
    * one file = one task — so a deployment shards into many ≤ HDFS-block
    * files at write time (this write inherits the input partitioning),
    * or re-codecs to zstd/bzip2 when per-file parallel reads matter. */
  def q_src_gzip_roundtrip(s: SparkSession, dir: String): DataFrame = {
    val path = scratch("gztext", dir)
    Tables.documents(s, dir)
      .select(concat_ws("\t", col("doc_id"), col("lang"),
        translate(col("text"), "\t\n", "  ")).as("value"))
      .write.mode(SaveMode.Overwrite).option("compression", "gzip").text(path)
    s.read.text(path)
      .select(split(col("value"), "\t", 3).as("f"))
      .select(element_at(col("f"), 1).cast("long").as("doc_id"),
        element_at(col("f"), 2).as("lang"),
        element_at(col("f"), 3).as("text"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("doc_id")).as("n_ids"),
        sum(length(col("text")).cast("bigint")).as("sum_chars"))
      .orderBy("lang")
  }

  /** zstd-compressed PARQUET round trip (r15 — VERDICT r14 missing #4
    * follow-through: /opt/spark/jars ships avro core but NOT the
    * spark-avro datasource, so the interchange gap closes with the
    * SPLITTABLE codec the gzip scale note itself recommends): the
    * documents table written `compression=zstd` (parquet-mr drives
    * zstd-jni directly — no native Hadoop codec required, unlike
    * zstd-coded text files), read back, and accounted with the same
    * per-lang lossless invariants as the text/gzip trips (shared-oracle
    * pattern) — parquet is typed, so the char mass is over the RAW
    * text, no line sanitization. A silent codec fallback cannot pass:
    * the data-file names parquet-mr writes must carry `.zstd.`. Scale
    * note: unlike .gz lines, zstd parquet keeps row-group
    * splittability at gzip-class ratios — the lakehouse default for
    * cold text corpora. */
  def q_src_zstd_roundtrip(s: SparkSession, dir: String): DataFrame = {
    val path = scratch("zstdpq", dir)
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("text"))
      .write.mode(SaveMode.Overwrite).option("compression", "zstd").parquet(path)
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    require(files.nonEmpty && files.forall(_.getName.contains(".zstd.")),
      s"zstd roundtrip: expected .zstd.parquet data files under $path, got " +
        files.map(_.getName).take(3).mkString(","))
    s.read.parquet(path)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("doc_id")).as("n_ids"),
        sum(length(col("text")).cast("bigint")).as("sum_chars"))
      .orderBy("lang")
  }

  // ── minimal manifest/snapshot table format (Delta/Iceberg-class) ────

  /** The smallest honest reconstruction of a lake table-format commit
    * protocol (public knowledge: the Delta log / Iceberg snapshot
    * design): data files are written under unique per-version
    * directories and are INVISIBLE until a manifest references them; a
    * manifest `_manifests/vNNNNN.manifest` lists every data file of its
    * snapshot (full file list, so a snapshot is self-contained and time
    * travel is one manifest read); the COMMIT POINT is a single atomic
    * rename of the staged `.tmp` manifest onto its final name. Readers
    * resolve `latest = max committed version` by listing complete
    * manifests only — a writer crashing anywhere before the rename
    * leaves data files and a `.tmp` that no reader ever resolves, so
    * torn versions are unobservable (SourceFormatSpec pins this with a
    * simulated crash). On HDFS the rename is atomic by contract; an
    * object-store deployment swaps the rename for put-if-absent on the
    * same manifest name — the protocol shape is identical. */
  private[graft] object AcidTable {
    import org.apache.hadoop.fs.Path

    private def fs(s: SparkSession, table: String) =
      new Path(table).getFileSystem(s.sparkContext.hadoopConfiguration)

    private def manifestDir(table: String) = new Path(table, "_manifests")

    private val ManifestRe = "v(\\d{5})\\.manifest".r

    /** Versions with a COMPLETE manifest — a `.tmp` is not a manifest. */
    private[graft] def versions(s: SparkSession, table: String): Seq[Int] = {
      val f = fs(s, table); val d = manifestDir(table)
      if (!f.exists(d)) Seq.empty
      else f.listStatus(d).map(_.getPath.getName)
        .collect { case ManifestRe(v) => v.toInt }.sorted.toSeq
    }

    /** Stage `df` as the data + manifest of `version` WITHOUT the commit
      * rename — exactly the state a crashed writer leaves behind. An
      * APPEND manifest lists the parent snapshot's files plus the new
      * ones; a REPLACE manifest (`append = false`) lists ONLY the new
      * files — the shape compaction (OPTIMIZE) and copy-on-write MERGE
      * commits have. Old snapshots keep their manifests either way, so
      * time travel is untouched until `vacuumBefore`. */
    private[graft] def stage(s: SparkSession, table: String, df: DataFrame,
        version: Int, append: Boolean = true): Unit = {
      val f = fs(s, table)
      val dataDir = new Path(table, f"data/v$version%05d")
      df.write.mode(SaveMode.ErrorIfExists).parquet(dataDir.toString)
      val newFiles = f.listStatus(dataDir).map(_.getPath.getName)
        .filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
        .sorted.map(n => f"data/v$version%05d/$n")
      val parentFiles = if (!append) Seq.empty
        else versions(s, table).filter(_ < version).lastOption
          .map(v => manifest(s, table, v)).getOrElse(Seq.empty)
      f.mkdirs(manifestDir(table))
      val tmp = new Path(manifestDir(table), f"v$version%05d.manifest.tmp")
      val out = f.create(tmp, true)
      try out.write((parentFiles ++ newFiles).mkString("\n").getBytes("UTF-8"))
      finally out.close()
    }

    /** The COMMIT: one atomic rename. Refuses to double-commit (the
      * put-if-absent semantics a concurrent-writer race needs). */
    private[graft] def commit(s: SparkSession, table: String, version: Int): Unit = {
      val f = fs(s, table)
      val tmp = new Path(manifestDir(table), f"v$version%05d.manifest.tmp")
      val dst = new Path(manifestDir(table), f"v$version%05d.manifest")
      require(!f.exists(dst), s"snapshot v$version already committed")
      require(f.rename(tmp, dst), s"atomic commit failed for v$version")
    }

    private[graft] def append(s: SparkSession, table: String, df: DataFrame,
        version: Int): Unit = {
      stage(s, table, df, version); commit(s, table, version)
    }

    /** REPLACE commit: the new snapshot's file list is exactly `df`'s
      * files (compaction / copy-on-write rewrite). */
    private[graft] def replace(s: SparkSession, table: String, df: DataFrame,
        version: Int): Unit = {
      stage(s, table, df, version, append = false); commit(s, table, version)
    }

    /** Idempotent append for exactly-once sinks (the foreachBatch
      * contract: version = batchId + 1): a retry of an already-committed
      * batch is a NO-OP — the manifest's existence IS the commit marker,
      * so at-least-once delivery collapses to exactly-once. Returns
      * whether this call committed. */
    private[graft] def appendIdempotent(s: SparkSession, table: String,
        df: DataFrame, version: Int): Boolean = {
      val f = fs(s, table)
      if (f.exists(new Path(manifestDir(table), f"v$version%05d.manifest"))) false
      else {
        // a retried CRASHED attempt may have left staged data — clear it
        val dataDir = new Path(table, f"data/v$version%05d")
        if (f.exists(dataDir)) f.delete(dataDir, true)
        append(s, table, df, version); true
      }
    }

    /** VACUUM: drop every snapshot strictly below `keepFrom` — delete
      * their manifests first (readers resolving versions can no longer
      * see them), then every data file referenced by NO surviving
      * manifest. Time travel below `keepFrom` fails loudly afterwards;
      * surviving snapshots are untouched. */
    private[graft] def vacuumBefore(s: SparkSession, table: String,
        keepFrom: Int): Unit = {
      val f = fs(s, table)
      val (drop, keep) = versions(s, table).partition(_ < keepFrom)
      require(keep.nonEmpty, s"vacuum would delete every snapshot of $table")
      drop.foreach { v =>
        f.delete(new Path(manifestDir(table), f"v$v%05d.manifest"), false)
      }
      val live = keep.flatMap(v => manifest(s, table, v)).toSet
      val dataRoot = new Path(table, "data")
      if (f.exists(dataRoot)) f.listStatus(dataRoot).foreach { d =>
        f.listStatus(d.getPath).foreach { file =>
          val rel = s"data/${d.getPath.getName}/${file.getPath.getName}"
          if (!live.contains(rel)) f.delete(file.getPath, false)
        }
      }
    }

    private[graft] def manifest(s: SparkSession, table: String, version: Int): Seq[String] = {
      val f = fs(s, table)
      val p = new Path(manifestDir(table), f"v$version%05d.manifest")
      val in = f.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty).toList
      finally in.close()
    }

    /** Snapshot-isolated read: latest committed version by default,
      * time travel with `version = Some(k)`. The scan reads EXACTLY the
      * manifest's file list — staged/orphaned files never leak in. */
    private[graft] def read(s: SparkSession, table: String,
        version: Option[Int] = None): DataFrame = {
      val vs = versions(s, table)
      require(vs.nonEmpty, s"no committed snapshot under $table")
      val v = version.getOrElse(vs.last)
      require(vs.contains(v), s"snapshot v$v does not exist (have ${vs.mkString(",")})")
      val files = manifest(s, table, v).map(rel => new Path(table, rel).toString)
      s.read.parquet(files: _*)
    }
  }

  /** ACID snapshot demo (round 14, VERDICT what's-missing #2): orders
    * lands as snapshot v1 (keys ≡ 0 mod 3), v2 appends keys ≡ 1, and a
    * THIRD writer crashes mid-commit (v3 staged, never renamed) — then
    * one output reads the LATEST snapshot and TIME-TRAVELS to v1. The
    * oracle replays both versions from the original parquet, and the
    * `latest_version` column asserts the torn v3 is unobservable: if
    * staged-but-uncommitted state ever leaked into reads or version
    * resolution, counts, sums, or the literal 2 would break the hash. */
  def q_src_acid_snapshot(s: SparkSession, dir: String): DataFrame = {
    val table = scratch("acid", dir)
    val f = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(table), true) // fresh table per run
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    AcidTable.append(s, table, orders.filter(col("o_orderkey") % 3 === 0), 1)
    AcidTable.append(s, table, orders.filter(col("o_orderkey") % 3 === 1), 2)
    AcidTable.stage(s, table, orders.filter(col("o_orderkey") % 3 === 2), 3)
    val latest = AcidTable.versions(s, table).last
    def snapAgg(df: DataFrame, v: Int): DataFrame = df
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"), Dsl.moneySum(col("o_totalprice")).as("sum_price"))
      .select(lit(v).as("snapshot_version"), lit(latest).as("latest_version"),
        col("o_orderstatus"), col("n_orders"), col("sum_price"))
    snapAgg(AcidTable.read(s, table, Some(1)), 1)
      .union(snapAgg(AcidTable.read(s, table), latest))
      .orderBy("snapshot_version", "o_orderstatus")
  }

  /** Compaction (OPTIMIZE) on the snapshot table (round 14): v1 + v2
    * land as appends, v3 rewrites the live data into ONE file via a
    * REPLACE commit — same rows, new layout, old snapshots untouched
    * (time travel to v1 still reads the original file set; vacuum is a
    * separate, spec-pinned step). The exact columns replay from the
    * original parquet; the layout facts land as booleans the oracle
    * asserts TRUE (file counts are layout-dependent — a cross-engine
    * hash on them would pin Spark's partitioning, not the protocol). */
  def q_src_acid_compact(s: SparkSession, dir: String): DataFrame = {
    val table = scratch("acidc", dir)
    val f = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(table), true)
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    AcidTable.append(s, table, orders.filter(col("o_orderkey") % 3 === 0), 1)
    AcidTable.append(s, table, orders.filter(col("o_orderkey") % 3 === 1), 2)
    AcidTable.replace(s, table, AcidTable.read(s, table).coalesce(1), 3)
    val nF2 = AcidTable.manifest(s, table, 2).length
    val nF3 = AcidTable.manifest(s, table, 3).length
    val latest = AcidTable.versions(s, table).last
    def agg1(df: DataFrame, n: String, sp: String): DataFrame =
      df.agg(count(lit(1)).as(n), Dsl.moneySum(col("o_totalprice")).as(sp))
    agg1(AcidTable.read(s, table), "n_orders_latest", "sum_price_latest")
      .crossJoin(agg1(AcidTable.read(s, table, Some(2)), "n2", "sp2"))
      .crossJoin(AcidTable.read(s, table, Some(1)).agg(count(lit(1)).as("n_orders_v1")))
      .select(lit(latest).as("latest_version"),
        col("n_orders_latest"), col("sum_price_latest"), col("n_orders_v1"),
        (col("n_orders_latest") === col("n2") &&
          col("sum_price_latest") === col("sp2")).as("data_unchanged"),
        lit(nF3 < nF2).as("files_reduced"),
        lit(nF3 == 1).as("compacted_single_file"))
  }

  /** Copy-on-write MERGE INTO the snapshot table (round 14 — the
    * lakehouse upsert beside the relational q_merge_upsert): the source
    * updates every key ≡ 0 mod 9 (price +1000.00) and inserts keys ≡ 1
    * mod 3; the new snapshot = target rows whose keys the source does
    * not touch (left anti) plus every source row, committed as a
    * REPLACE. Time travel to v1 still shows the pre-merge table (the
    * `n_orders_v1` column); everything is exact and fully
    * oracle-replayed from the original parquet. */
  def q_src_acid_merge(s: SparkSession, dir: String): DataFrame = {
    val table = scratch("acidm", dir)
    val f = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(table), true)
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    AcidTable.append(s, table, orders.filter(col("o_orderkey") % 3 === 0), 1)
    val src = orders.filter(col("o_orderkey") % 9 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
      .unionByName(orders.filter(col("o_orderkey") % 3 === 1))
    val tgt = AcidTable.read(s, table)
    val merged = tgt.join(src.select(col("o_orderkey").as("sk")),
        col("o_orderkey") === col("sk"), "left_anti")
      .unionByName(src)
    AcidTable.replace(s, table, merged, 2)
    val latest = AcidTable.versions(s, table).last
    AcidTable.read(s, table)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"), Dsl.moneySum(col("o_totalprice")).as("sum_price"))
      .crossJoin(AcidTable.read(s, table, Some(1)).agg(count(lit(1)).as("n_orders_v1")))
      .select(lit(latest).as("latest_version"), col("o_orderstatus"),
        col("n_orders"), col("sum_price"), col("n_orders_v1"))
      .orderBy("o_orderstatus")
  }

  /** CDC over the snapshot table (round 14 — the `table_changes()`
    * surface that completes the lakehouse story: snapshot → time
    * travel → compaction → merge → vacuum → exactly-once → CHANGES):
    * the diff between two committed versions, computed as a full outer
    * join of the two snapshot reads on the key — insert (new key),
    * update (key present in both, value changed), unchanged. Runs on
    * the COW-merge table, so every change class is populated; counts
    * and exact money deltas replay relationally in the oracle. A
    * change-data feed at 100 TB is this exact join shape, keyed and
    * shuffle-partitioned on the table key. */
  def q_src_acid_diff(s: SparkSession, dir: String): DataFrame = {
    val table = scratch("acidd", dir)
    val f = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(table), true)
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    AcidTable.append(s, table, orders.filter(col("o_orderkey") % 3 === 0), 1)
    val src = orders.filter(col("o_orderkey") % 9 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
      .unionByName(orders.filter(col("o_orderkey") % 3 === 1))
    val merged = AcidTable.read(s, table)
      .join(src.select(col("o_orderkey").as("sk")),
        col("o_orderkey") === col("sk"), "left_anti")
      .unionByName(src)
    AcidTable.replace(s, table, merged, 2)
    val a = AcidTable.read(s, table, Some(1))
      .select(col("o_orderkey").as("ka"), col("o_totalprice").as("pa"))
    val b = AcidTable.read(s, table, Some(2))
      .select(col("o_orderkey").as("kb"), col("o_totalprice").as("pb"))
    a.join(b, col("ka") === col("kb"), "full_outer")
      .select(
        when(col("ka").isNull, "insert")
          .when(col("kb").isNull, "delete")
          .when(col("pa") =!= col("pb"), "update")
          .otherwise("unchanged").as("change_type"),
        coalesce(col("pb"), lit(0.0)).as("p_after"),
        (coalesce(col("pb"), lit(0.0)) - coalesce(col("pa"), lit(0.0))).as("p_delta"))
      .groupBy(col("change_type"))
      .agg(count(lit(1)).as("n_rows"),
        Dsl.moneySum(col("p_after")).as("sum_price_after"),
        Dsl.moneySum(col("p_delta")).as("sum_price_delta"))
      .orderBy("change_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_src_acid_snapshot" -> q_src_acid_snapshot _,
    "q_src_acid_compact" -> q_src_acid_compact _,
    "q_src_acid_merge" -> q_src_acid_merge _,
    "q_src_acid_diff" -> q_src_acid_diff _,
    "q_src_gzip_roundtrip" -> q_src_gzip_roundtrip _,
    "q_src_zstd_roundtrip" -> q_src_zstd_roundtrip _,
    "q_src_text_roundtrip" -> q_src_text_roundtrip _,
    "q_src_binary_ingest" -> q_src_binary_ingest _,
    "q_src_zorder_layout" -> q_src_zorder_layout _,
    "q_src_schema_evolution" -> q_src_schema_evolution _,
    "q_join_bucketed" -> q_join_bucketed _,
    "q_src_csv_roundtrip" -> q_src_csv_roundtrip _,
    "q_src_json_roundtrip" -> q_src_json_roundtrip _,
    "q_src_orc_roundtrip" -> q_src_orc_roundtrip _,
    "q_src_partitioned_sink" -> q_src_partitioned_sink _
  )
}
