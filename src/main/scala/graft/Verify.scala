package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // Optional 3rd arg (dev only): regex over query names — the driver
    // always passes exactly (sfDir, outDir) and gets the full surface.
    val (sfDir, outDir, nameRe) = args match {
      case Array(a, b)     => (a, b, ".*")
      case Array(a, b, re) => (a, b, re)
    }
    val spark = Harness.session(defaultCpus = "4")
    // Clear any prior dump for the selected queries FIRST: a query that
    // fails this run must leave NO parquet behind, or a stale dump from
    // an earlier run silently passes the oracle compare (observed in
    // round 9: a failed q_gnn_attention "passed" against a 2-hour-old
    // dump). Scoped to the name filter so dev re-runs of a subset don't
    // wipe the rest.
    val outRoot = new java.io.File(outDir)
    if (outRoot.isDirectory) {
      outRoot.listFiles().foreach { f =>
        if (f.isDirectory && f.getName.matches(nameRe)) {
          def rm(x: java.io.File): Unit = {
            if (x.isDirectory) x.listFiles().foreach(rm)
            x.delete(); ()
          }
          rm(f)
        }
      }
    }
    outRoot.mkdirs()
    SparkEntry.queries.filter(_._1.matches(nameRe)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(_._1.matches(nameRe))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
