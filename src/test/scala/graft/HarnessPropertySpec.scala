package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based pins for the bench harness's pure functions — the
  * pieces the official perf record's integrity rests on — and for the
  * scale-probe perturbation invariant the round-9 review fixed. */
class HarnessPropertySpec extends AnyFunSuite {

  private def check(p: Prop, label: String): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, s"$label: ${res.status}")
  }

  private val name: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map("q_" + _.mkString)
  private val secs: Gen[Double] =
    Gen.chooseNum(0.0, 10000.0).map(v => math.rint(v * 1000) / 1000)

  test("parseFlatJson round-trips every map Bench itself writes") {
    val gmap = Gen.mapOf(Gen.zip(name, secs))
    check(Prop.forAll(gmap) { m =>
      // serialize exactly as tools/bench_targets.json is written
      val text = "{\n" + m.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""$k": $v""" }.mkString(",\n") + "\n}\n"
      Bench.parseFlatJson(text) == m
    }, "parseFlatJson roundtrip")
  }

  private val sample: Gen[Double] = Gen.frequency(
    9 -> Gen.chooseNum(0.001, 100.0).map(v => math.rint(v * 1000) / 1000),
    1 -> Gen.const(-1.0)) // failed-sample sentinel

  test("mergeMin: official value is the min of honest samples, never a resurrection") {
    val gfirst = Gen.nonEmptyListOf(Gen.zip(name, sample)).map(_.distinctBy(_._1))
    val gsecond = Gen.mapOf(Gen.zip(name, sample))
    check(Prop.forAll(gfirst, gsecond) { (first, second) =>
      val merged = Bench.mergeMin(first, second)
      merged.map(_._1) == first.map(_._1) && // key order preserved
        merged.forall { case (k, v) =>
          val f = first.find(_._1 == k).get._2
          val sOpt = second.get(k).filter(_ >= 0)
          val honest = Seq(f).filter(_ >= 0) ++ sOpt
          if (honest.isEmpty) v == f // both failed: sentinel survives
          else v == honest.min
        }
    }, "mergeMin law")
  }

  test("canaryDrifted is blind to sample order") {
    val triple = Gen.listOfN(3, sample)
    check(Prop.forAll(triple, Gen.chooseNum(0.1, 2.0)) { (xs, floor) =>
      val perms = xs.permutations.map { case List(a, b, c) =>
        Bench.canaryDrifted((a, b, c), floor)
      }.toSet
      perms.size == 1
    }, "gate permutation invariance")
  }

  test("perturbed-copy token suffixing keeps copies token-disjoint (incl. digit tokens)") {
    // the round-9 review catch: a BARE digit suffix collides across
    // copies ("x"+"11" == "x1"+"1"); the middle-dot separator cannot,
    // because the separator is outside the token alphabet, so the final
    // '·' in each suffixed token splits it unambiguously
    val token: Gen[String] = Gen.nonEmptyListOf(
      Gen.frequency(2 -> Gen.numChar, 1 -> Gen.alphaLowerChar)).map(_.mkString)
    val gtoks = Gen.nonEmptyListOf(token)
    val gk = Gen.chooseNum(1, 15)
    check(Prop.forAll(gtoks, gtoks, gk, gk) { (ts, us, i, j) =>
      val si = ts.map(_ + "·" + i).toSet
      val sj = us.map(_ + "·" + j).toSet
      i == j || (si & sj).isEmpty
    }, "copy disjointness")
  }
}
