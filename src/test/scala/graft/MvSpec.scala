package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Mv

/** Contract pins for the session-MV registry: build-once identity,
  * and AQE restoration around the non-adaptive build window (the
  * checkpoint-partitioning device — see Mv.memo's scaladoc). */
class MvSpec extends AnyFunSuite {
  import TestSpark._

  // Keys are unique per suite instantiation: Mv's cache is app-scoped,
  // so a fixed key would see builds == 0 on a re-run of the suite inside
  // the same Spark application (ADVICE r6).
  private val runId = java.util.UUID.randomUUID().toString.take(8)

  test("memo returns the identical DataFrame on every call; build runs once") {
    val s = spark
    var builds = 0
    def build() = { builds += 1; s.range(3).toDF() }
    val a = Mv.memo(s, s"mvspec-identity-$runId")(build())
    val b = Mv.memo(s, s"mvspec-identity-$runId")(build())
    assert(a eq b, "second call must return the cached instance")
    assert(builds == 1, s"build must run exactly once, ran $builds")
  }

  test("builds run non-adaptively and AQE is restored afterwards — even on failure") {
    val s = spark
    val before = s.conf.get("spark.sql.adaptive.enabled")
    var seenInside: String = null
    Mv.memo(s, s"mvspec-aqe-ok-$runId") {
      seenInside = s.conf.get("spark.sql.adaptive.enabled")
      s.range(1).toDF()
    }
    assert(seenInside == "false", "build must run with AQE off")
    assert(s.conf.get("spark.sql.adaptive.enabled") == before,
      "AQE setting must be restored after a successful build")
    intercept[RuntimeException] {
      Mv.memo(s, s"mvspec-aqe-fail-$runId") { throw new RuntimeException("boom") }
    }
    assert(s.conf.get("spark.sql.adaptive.enabled") == before,
      "AQE setting must be restored after a failed build")
    // a failed build must NOT poison the cache: the key stays buildable
    val ok = Mv.memo(s, s"mvspec-aqe-fail-$runId")(s.range(2).toDF())
    assert(ok.count() == 2)
  }

  test("census lists live keys; evict frees the registry entry for rebuild") {
    val s = spark
    val key = s"mvspec-evict-$runId"
    var builds = 0
    Mv.memo(s, key) { builds += 1; s.range(4).toDF().localCheckpoint() }
    assert(Mv.keys(s).contains(key), "census must list the cached key")
    assert(Mv.evict(s, key), "evict must report the entry was present")
    assert(!Mv.keys(s).contains(key), "evicted key must leave the census")
    assert(!Mv.evict(s, key), "second evict must be a no-op")
    Mv.memo(s, key) { builds += 1; s.range(4).toDF().localCheckpoint() }
    assert(builds == 2, "an evicted key must be buildable again")
    Mv.evict(s, key)
  }
}
