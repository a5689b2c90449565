package graft

import org.scalatest.funsuite.AnyFunSuite

/** The extensions route: TestSpark builds its session with
  * spark.sql.extensions=graft.GraftExtensions, so the native expressions
  * must resolve as plain SQL functions with no manual registration. */
class ExtensionsSpec extends AnyFunSuite {
  import TestSpark._

  test("graft_vec_dot is available via spark.sql.extensions") {
    val r = spark.sql(
      "SELECT graft_vec_dot(array(cast(1.5 as float), cast(2.0 as float))," +
        " array(cast(2.0 as float), cast(3.0 as float))) AS d").collect()
    assert(r(0).getDouble(0) == 1.5 * 2.0 + 2.0 * 3.0)
  }

  test("graft_simhash64 is available and type-checked via extensions") {
    val r = spark.sql("SELECT graft_simhash64(array('a','b','c')) AS h").collect()
    val again = spark.sql("SELECT graft_simhash64(array('a','b','c')) AS h").collect()
    assert(r(0).getLong(0) == again(0).getLong(0))
    // analysis-time rejection of wrong input types
    val err = intercept[Exception] {
      spark.sql("SELECT graft_simhash64(array(1, 2))").collect()
    }
    assert(err.getMessage.toLowerCase.contains("array<string>") ||
      err.getMessage.toLowerCase.contains("datatype_mismatch"))
  }

  test("graft_vec_dot rejects non-float arrays at analysis time") {
    val err = intercept[Exception] {
      spark.sql("SELECT graft_vec_dot(array(1.0, 2.0), array(3.0, 4.0))").collect()
    }
    assert(err.getMessage.toLowerCase.contains("array<float>") ||
      err.getMessage.toLowerCase.contains("datatype_mismatch"))
  }
}
