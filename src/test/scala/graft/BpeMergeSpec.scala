package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.BpeOps

/** Property pin for the greedy-merge window kernel: `applyMerge`'s
  * running-sum island formulation (one (doc_id) partitioning) must
  * reproduce plain left-to-right greedy merging — walk the symbols, if
  * (sym, next) equals the pair then emit the merged symbol and skip
  * both, else emit and advance one — on ANY input. Randomized over a
  * 2-letter alphabet so self-pair runs (the overlapping-match case the
  * odd-rank-within-island logic exists for) occur constantly, plus the
  * degenerate shapes (empty, single symbol, all-same). */
class BpeMergeSpec extends AnyFunSuite {
  import TestSpark._

  /** Reference greedy merger (the definition, executed naively). */
  private def greedy(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  test("applyMerge equals naive left-to-right greedy merging on random docs") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val docs: Seq[(Long, Vector[String])] =
      // fixed shapes first: empty-adjacent, singleton, all-same runs of
      // every parity, then random 2-letter docs (dense self-pair runs)
      Seq(Vector("a"), Vector("a", "a"), Vector("a", "a", "a"),
        Vector.fill(8)("a"), Vector.fill(9)("a"))
        .zipWithIndex.map { case (v, i) => (i.toLong, v) } ++
      (5 until 40).map { i =>
        (i.toLong, Vector.fill(rnd.nextInt(30) + 1)(if (rnd.nextBoolean()) "a" else "b"))
      }
    val posRows = docs.flatMap { case (id, syms) =>
      syms.zipWithIndex.map { case (sym, p) => (id, (p + 1).toLong, sym) }
    }
    val t = posRows.toDF("doc_id", "pos", "sym")
    for ((pa, pb) <- Seq(("a", "a"), ("a", "b"), ("b", "a"), ("b", "b"))) {
      val merged = BpeOps.applyMerge(t, Seq((pa, pb)).toDF("a", "b"))
        // output pos is the row_number() renumber → IntegerType
        .collect().map(r => (r.getLong(0), r.getInt(1).toLong, r.getString(2)))
        .groupBy(_._1).map { case (id, rows) =>
          id -> rows.sortBy(_._2).map(_._3).toVector
        }
      docs.foreach { case (id, syms) =>
        val expect = greedy(syms, pa, pb)
        assert(merged.getOrElse(id, Vector.empty) == expect,
          s"doc $id pair ($pa,$pb): got ${merged.getOrElse(id, Vector.empty)}, " +
            s"want $expect (input $syms)")
      }
    }
  }
}
