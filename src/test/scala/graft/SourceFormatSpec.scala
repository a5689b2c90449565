package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables

/** Source-format coverage: the engine's tables round-trip through CSV and
  * JSON sources with explicit schemas (the reader path a heterogeneous
  * 100 TB lake needs), matching the parquet ground truth. */
class SourceFormatSpec extends AnyFunSuite {
  import TestSpark._

  test("csv and json sources round-trip the documents table") {
    val s = spark
    val docs = Tables.documents(s, sf0001).orderBy("doc_id")
    val base = java.nio.file.Files.createTempDirectory("graft_fmt").toString

    docs.write.mode("overwrite").option("header", "true")
      .option("quote", "\"").option("escape", "\"").csv(s"$base/csv")
    val csvBack = s.read.schema(docs.schema).option("header", "true")
      .option("quote", "\"").option("escape", "\"").csv(s"$base/csv")
      .orderBy("doc_id")
    assert(csvBack.collect().toSeq == docs.collect().toSeq, "csv round-trip")

    docs.write.mode("overwrite").json(s"$base/json")
    val jsonBack = s.read.schema(docs.schema).json(s"$base/json").orderBy("doc_id")
    assert(jsonBack.collect().toSeq == docs.collect().toSeq, "json round-trip")

    // a query runs identically over the non-parquet source
    val q = (df: org.apache.spark.sql.DataFrame) =>
      df.groupBy("lang").agg(count(lit(1)).as("n")).orderBy("lang").collect().toSeq
    assert(q(jsonBack) == q(docs))
  }

  test("orc source round-trips documents and embeddings") {
    val s = spark
    val base = java.nio.file.Files.createTempDirectory("graft_fmt_orc").toString
    val docs = Tables.documents(s, sf0001).orderBy("doc_id")
    docs.write.mode("overwrite").orc(s"$base/docs")
    val docsBack = s.read.orc(s"$base/docs").orderBy("doc_id")
    assert(docsBack.collect().toSeq == docs.collect().toSeq, "orc docs round-trip")
    val emb = Tables.embeddings(s, sf0001).orderBy("vec_id")
    emb.write.mode("overwrite").orc(s"$base/emb")
    val embBack = s.read.orc(s"$base/emb").orderBy("vec_id")
    assert(embBack.schema == emb.schema, "orc preserves array<float> schema")
    assert(embBack.collect().toSeq.map(_.getSeq[Float](1).toSeq) ==
      emb.collect().toSeq.map(_.getSeq[Float](1).toSeq))
  }

  test("acid snapshot: a writer crash between stage and commit is unobservable") {
    val s = spark
    import graft.engine.SourceOps.AcidTable
    val table = java.nio.file.Files.createTempDirectory("graft_acid").toString + "/t"
    val docs = Tables.documents(s, sf0001).select(col("doc_id"), col("lang"))
    AcidTable.append(s, table, docs.filter(col("doc_id") % 2 === 0), 1)
    val v1 = AcidTable.read(s, table).count()

    // CRASH WINDOW: v2's data files + tmp manifest exist, rename never ran
    AcidTable.stage(s, table, docs.filter(col("doc_id") % 2 === 1), 2)
    assert(AcidTable.versions(s, table) == Seq(1), "torn v2 must not resolve")
    assert(AcidTable.read(s, table).count() == v1,
      "reader during the crash window must see exactly snapshot v1")

    // recovery: the commit rename completes -> v2 becomes visible atomically
    AcidTable.commit(s, table, 2)
    assert(AcidTable.versions(s, table) == Seq(1, 2))
    assert(AcidTable.read(s, table).count() == docs.count(), "v2 = full append")
    // time travel still reads the exact v1 file set
    assert(AcidTable.read(s, table, Some(1)).count() == v1)
    // double-commit refused (put-if-absent semantics)
    intercept[IllegalArgumentException] { AcidTable.commit(s, table, 2) }
  }

  test("acid compaction + vacuum: layout changes, data doesn't; vacuum kills time travel loudly") {
    val s = spark
    import graft.engine.SourceOps.AcidTable
    val table = java.nio.file.Files.createTempDirectory("graft_acidv").toString + "/t"
    val docs = Tables.documents(s, sf0001).select(col("doc_id"), col("lang"))
    AcidTable.append(s, table, docs.filter(col("doc_id") % 2 === 0), 1)
    AcidTable.append(s, table, docs.filter(col("doc_id") % 2 === 1), 2)
    val before = AcidTable.read(s, table).orderBy("doc_id").collect().toSeq
    AcidTable.replace(s, table, AcidTable.read(s, table).coalesce(1), 3)
    assert(AcidTable.manifest(s, table, 3).length == 1, "compacted to one file")
    assert(AcidTable.read(s, table).orderBy("doc_id").collect().toSeq == before,
      "compaction must not change the data")
    // old snapshots still time-travel pre-vacuum
    assert(AcidTable.read(s, table, Some(2)).count() == before.length)
    val v1n = AcidTable.read(s, table, Some(1)).count()
    AcidTable.vacuumBefore(s, table, 3)
    assert(AcidTable.versions(s, table) == Seq(3), "vacuum drops old snapshots")
    intercept[IllegalArgumentException] { AcidTable.read(s, table, Some(1)) }
    assert(AcidTable.read(s, table).orderBy("doc_id").collect().toSeq == before,
      "the surviving snapshot reads bit-identically after vacuum")
    assert(v1n > 0)
    // vacuum refuses to delete the whole table
    intercept[IllegalArgumentException] { AcidTable.vacuumBefore(s, table, 99) }
  }

  test("acid sink is exactly-once under at-least-once batch retries") {
    val s = spark
    import graft.engine.SourceOps.AcidTable
    val table = java.nio.file.Files.createTempDirectory("graft_acid1x").toString + "/t"
    val docs = Tables.documents(s, sf0001).select(col("doc_id"), col("lang"))
    // the foreachBatch contract: version = batchId + 1; a redelivered
    // batch finds its manifest and no-ops
    def deliver(batchId: Int, df: org.apache.spark.sql.DataFrame): Boolean =
      AcidTable.appendIdempotent(s, table, df, batchId + 1)
    val b0 = docs.filter(col("doc_id") % 2 === 0)
    val b1 = docs.filter(col("doc_id") % 2 === 1)
    assert(deliver(0, b0), "first delivery commits")
    assert(!deliver(0, b0), "redelivery of batch 0 is a no-op")
    assert(deliver(1, b1))
    assert(!deliver(1, b1) && !deliver(0, b0), "late redeliveries still no-op")
    assert(AcidTable.read(s, table).count() == docs.count(),
      "each batch lands exactly once")
    // a crashed first attempt (staged data, no manifest) is cleaned and
    // re-committed by the retry
    AcidTable.stage(s, table, docs.limit(3), 3)
    assert(deliver(2, docs.limit(3)), "retry after a crashed attempt commits")
    assert(AcidTable.read(s, table).count() == docs.count() + 3)
  }

  test("acid snapshot query: 6 rows, torn v3 never observed") {
    val r = graft.engine.SourceOps.q_src_acid_snapshot(spark, sf0001).collect()
    assert(r.length == 6)
    assert(r.forall(_.getInt(1) == 2), "latest_version must ignore the staged v3")
    // v2 strictly contains v1 per status
    val v1 = r.filter(_.getInt(0) == 1).map(x => x.getString(2) -> x.getLong(3)).toMap
    val v2 = r.filter(_.getInt(0) == 2).map(x => x.getString(2) -> x.getLong(3)).toMap
    assert(v1.keySet == v2.keySet && v1.forall { case (k, n) => v2(k) > n })
  }

  test("json source round-trips the embeddings float arrays") {
    val s = spark
    val emb = Tables.embeddings(s, sf0001).orderBy("vec_id")
    val base = java.nio.file.Files.createTempDirectory("graft_fmt_emb").toString
    emb.write.mode("overwrite").json(s"$base/json")
    val back = s.read.schema(emb.schema).json(s"$base/json").orderBy("vec_id")
    assert(back.count() == emb.count())
    val a = back.select("embedding").limit(3).collect().map(_.getSeq[Float](0))
    val b = emb.select("embedding").limit(3).collect().map(_.getSeq[Float](0))
    assert(a.toSeq.map(_.toSeq) == b.toSeq.map(_.toSeq))
  }
}
