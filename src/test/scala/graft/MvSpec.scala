package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Mv

/** Contract pins for the session-MV registry: build-once identity,
  * and AQE restoration around the non-adaptive build window (the
  * checkpoint-partitioning device — see Mv.memo's scaladoc). */
class MvSpec extends AnyFunSuite {
  import TestSpark._

  test("memo returns the identical DataFrame on every call; build runs once") {
    val s = spark
    var builds = 0
    def build() = { builds += 1; s.range(3).toDF() }
    val a = Mv.memo(s, "mvspec-identity")(build())
    val b = Mv.memo(s, "mvspec-identity")(build())
    assert(a eq b, "second call must return the cached instance")
    assert(builds == 1, s"build must run exactly once, ran $builds")
  }

  test("builds run non-adaptively and AQE is restored afterwards — even on failure") {
    val s = spark
    val before = s.conf.get("spark.sql.adaptive.enabled")
    var seenInside: String = null
    Mv.memo(s, "mvspec-aqe-ok") {
      seenInside = s.conf.get("spark.sql.adaptive.enabled")
      s.range(1).toDF()
    }
    assert(seenInside == "false", "build must run with AQE off")
    assert(s.conf.get("spark.sql.adaptive.enabled") == before,
      "AQE setting must be restored after a successful build")
    intercept[RuntimeException] {
      Mv.memo(s, "mvspec-aqe-fail") { throw new RuntimeException("boom") }
    }
    assert(s.conf.get("spark.sql.adaptive.enabled") == before,
      "AQE setting must be restored after a failed build")
    // a failed build must NOT poison the cache: the key stays buildable
    val ok = Mv.memo(s, "mvspec-aqe-fail")(s.range(2).toDF())
    assert(ok.count() == 2)
  }
}
