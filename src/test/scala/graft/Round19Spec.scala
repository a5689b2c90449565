package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Gnn, GraphOps, Tables}

/** Round-19 (driver r13) replay pins: every operator landed this round
  * re-derived driver-side from first principles on sf0.001. */
class Round19Spec extends AnyFunSuite {
  import TestSpark._

  private def r6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The exact quantizer both engines implement: pure IEEE ops. */
  private def q9(x: Double): Long = {
    val y = x * 1e9
    (if (y >= 0) math.floor(y + 0.5) else math.ceil(y - 0.5)).toLong
  }

  test("q_gnn_layer_k equals a driver-side 3-layer quantized replay") {
    val edges = GraphOps.edges(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val emb = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    val nEmb = emb.size.toLong

    def meanForward(l: Int, groups: Map[Long, Seq[Array[Double]]]): Map[Long, Array[Double]] =
      groups.map { case (k, vs) =>
        val sums = new Array[Long](Gnn.Dim)
        vs.foreach { v =>
          var i = 0; while (i < Gnn.Dim) { sums(i) += q9(v(i)); i += 1 }
        }
        val m = sums.map(_.toDouble / vs.size / 1e9)
        k -> Gnn.forwardK(l, m)
      }

    val h1 = meanForward(1, edges.groupBy(_._1).map { case (c, es) =>
      c -> es.toSeq.map { case (_, p) => emb(p % nEmb) } })
    val h2 = meanForward(2, edges.groupBy(_._2).map { case (p, es) =>
      p -> es.toSeq.map { case (c, _) => h1(c) } })
    val h3 = meanForward(3, edges.groupBy(_._1).map { case (c, es) =>
      c -> es.toSeq.map { case (_, p) => h2(p) } })

    val got = Gnn.q_gnn_layer_k(spark, sf0001).collect()
    assert(got.length == h3.size, "customer coverage")
    got.foreach { r =>
      val want = h3(r.getLong(0))
      (1 to 4).foreach { i =>
        assert(r.getDouble(i) == r6(want(i - 1)),
          s"cust ${r.getLong(0)} k$i: got ${r.getDouble(i)} want ${r6(want(i - 1))}")
      }
      // r15 full-width certification: the position-weighted exact-integer
      // digest must reproduce over ALL 64 dims of the replay
      val wantDig = (0 until Gnn.Dim).map(i => (i + 1) * q9(want(i))).sum
      assert(r.getLong(5) == wantDig,
        s"cust ${r.getLong(0)} hdigest: got ${r.getLong(5)} want $wantDig")
    }
    // the three layers must actually differ (per-layer seeds): a shared-W
    // regression would make layer 1 and layer 3 identical functions
    val probe = Array.fill(Gnn.Dim)(0.3)
    assert(!Gnn.forwardK(1, probe).sameElements(Gnn.forwardK(3, probe)),
      "layer seeds must differentiate the dense passes")
    assert(!Gnn.forwardK(1, probe).sameElements(Gnn.forward(probe)),
      "layer-1 must differ from the base q_gnn_layer weights")
  }

  test("z-order layout prunes; insertion order cannot (the re-cluster argument)") {
    val rows = graft.engine.SourceOps.q_src_zorder_layout(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toMap
    assert(rows.keySet == Set("natural", "zorder"))
    val (nf, natHit, natRatio, natRows) = rows("natural")
    val (zf, zoHit, zoRatio, zoRows) = rows("zorder")
    assert(nf == 64L && zf == 64L, "both layouts pack 64 files")
    assert(natRows == zoRows, "layouts hold the same rows")
    // insertion order interleaves users, so most zone maps span the
    // probe (54/64 at sf0.001's 1k events, 64/64 at sf0.1); the Morton
    // order must prune toward the decile selectivity
    assert(natHit > 32L, s"insertion-order zone maps barely prune, hit $natHit/64")
    assert(zoHit < 20L && zoHit >= 1L,
      s"z-order must localize the probe band, hit $zoHit/64 files")
    assert(zoRatio * 3 < natRatio, "the re-clustering argument itself")
  }

  test("motif pattern parser round-trips the string surface") {
    val m = GraphOps.parseMotif("w", "( x )-( y );  (y)-(z) ;x<z")
    assert(m.edges == Seq("x" -> "y", "y" -> "z") && m.lt == Seq("x" -> "z"))
    intercept[IllegalArgumentException] {
      GraphOps.parseMotif("bad", "(x)->(y)") // directed syntax unsupported
    }
    intercept[IllegalArgumentException] {
      GraphOps.parseMotif("empty", "x<y") // constraints only, no edges
    }
  }

  test("motif compiler: join form == brute force == closed form on a known graph") {
    val s = spark
    import s.implicits._
    // bowtie-ish: triangle {1,2,3} + tail 1-4 + path 4-5
    val base = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (4L, 5L))
    val und = (base ++ base.map(_.swap)).toDF("a", "b")
    def cnt(name: String): Long =
      GraphOps.compileMotif(und, GraphOps.MotifPatterns.find(_.name == name).get).count()
    assert(cnt("chain3") == 6L, "wedges: sum C(deg,2) = 3+1+1+1+0")
    assert(cnt("triangle") == 1L, "exactly the {1,2,3} triangle")
    // star3: the registered op compiles this via the degree closed form;
    // the generic join compilation must agree (drift pin)
    assert(cnt("star3") == 1L, "only node 1 has C(3,3) = 1 claws")
    val closed = und.groupBy(col("a")).agg(count(lit(1)).as("d"))
      .agg(sum(expr("d * (d - 1) * (d - 2) div 6"))).collect()(0).getLong(0)
    assert(closed == 1L, "closed form agrees with the join compilation")
    // round-14 4-node tier on the same graph: join compilation first
    assert(cnt("square") == 0L, "no 4-cycles in the bowtie graph")
    assert(cnt("tailed_triangle") == 1L,
      "exactly the {1,2,3} triangle tailed at 1 by 4")
    assert(cnt("star4") == 0L, "max degree 3 -> C(3,4) = 0")
    // tailed closed form Σ t(v)(deg(v)-2): t(1)=1,d=3 -> 1; others 0
    val tl = Seq((1L, 1L, 3L), (2L, 1L, 2L), (3L, 1L, 2L))
      .map { case (_, t, d) => t * (d - 2) }.sum
    assert(tl == 1L, "tailed closed form agrees")
    // and a genuine square graph pins the codegree identity: the 4-cycle
    // 1-2-3-4 has codeg({1,3}) = codeg({2,4}) = 2 -> Σ C(2,2) / 2 = 1
    val sqBase = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
    val sqUnd = (sqBase ++ sqBase.map(_.swap)).toDF("a", "b")
    def cntOn(g: org.apache.spark.sql.DataFrame, name: String): Long =
      GraphOps.compileMotif(g, GraphOps.MotifPatterns.find(_.name == name).get).count()
    assert(cntOn(sqUnd, "square") == 1L, "the 4-cycle labels exactly once")
    val codegSq = sqUnd.select(col("a").as("c"), col("b").as("u"))
      .join(sqUnd.select(col("a").as("c2"), col("b").as("v")),
        col("c") === col("c2") && col("u") < col("v"))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("cd"))
      .agg(expr("sum(cd * (cd - 1) div 2) div 2")).collect()(0).getLong(0)
    assert(codegSq == 1L, "codegree identity agrees with the join compilation")
    // and the registered op is non-vacuous on the fixture: every
    // pattern matches at least once at sf0.001
    val rows = GraphOps.q_graph_motif_find(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("chain3", "star3", "triangle",
      "square", "tailed_triangle", "star4"))
    assert(rows.values.forall(_ > 0L), s"vacuous pattern count: $rows")
  }
}
