package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins (SURVEY §4.4): key salting, the
  * manual counterpart of AQE's runtime skew-join splitting. AQE handles
  * skewed SORT-MERGE joins adaptively, but it can only split what it can
  * observe — a join that must shuffle on a pathologically hot key (one
  * customer owning 1% of a 100 TB event stream) still funnels that key's
  * rows through one task before AQE sees partition sizes. Salting moves
  * the fix to plan time: the big side scatters each key across `salts`
  * sub-keys, the small side replicates `salts`×, and the hot key's rows
  * spread over `salts` tasks by construction.
  *
  * Replication cost is `salts × |small|`, so this composes with (not
  * replaces) broadcasting: use `broadcast()` while the small side fits
  * (no shuffle at all), salting when it doesn't.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `bigKey = smallKey`, scattered over
    * `salts` sub-keys. `saltSource` must be a deterministic per-row
    * column of the big side (an id, NOT rand() — reruns and retries must
    * salt identically); rows of one join key spread across tasks while
    * every (key, salt) pair still meets its replicated small-side match.
    * Result equals the plain inner join (salt columns dropped). */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: Column,
      smallKey: Column, salts: Int, saltSource: Column): DataFrame = {
    // null saltSource lands in bucket 0 instead of vanishing: pmod(null)
    // is null and would never equal a small-side salt, silently dropping
    // rows the plain inner join keeps.
    val b = big.withColumn("_salt_b",
      pmod(coalesce(saltSource, lit(0)), lit(salts)).cast("int"))
    val sm = small.withColumn("_salt_s",
      explode(sequence(lit(0), lit(salts - 1))))
    b.join(sm, bigKey === smallKey && col("_salt_b") === col("_salt_s"))
      .drop("_salt_b", "_salt_s")
  }

  /** Contract query for the salted pattern: events ⋈ customer through an
    * 8-way salt (salt source = event_id), per-nation event counts and
    * exact money sums. The oracle is the PLAIN join — salting must be
    * invisible in the result, visible only in the shuffle layout. */
  def q_join_skew_salted(s: SparkSession, dir: String): DataFrame =
    saltedJoin(Tables.events(s, dir), Tables.customer(s, dir),
      col("user_id"), col("c_custkey"), salts = 8, saltSource = col("event_id"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_events"), Dsl.moneySum(col("value")).as("val_sum"))
      .orderBy("c_nationkey")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_skew_salted" -> q_join_skew_salted _
  )
}
