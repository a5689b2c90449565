package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.execution.SparkPlan

/** Checkpoint-transparent plan capture (VERDICT r14 lead item).
  *
  * `localCheckpoint()` truncates lineage to a `LogicalRDD` leaf, so any
  * plan hazard inside the checkpointed subtree — an unpartitioned
  * corpus-scale window, a cartesian product, an unbounded
  * BroadcastNestedLoopJoin — became INVISIBLE to the full-surface plan
  * gate (PlanAuditSpec): the gate audited only the final, truncated
  * plan, and every new mid-query checkpoint silently shrank its
  * coverage (the r14 q_text_heaps_law blind spot: a doc-count-sized
  * global ntile hidden behind a 10-row checkpoint).
  *
  * Every engine checkpoint of a derived table therefore routes through
  * `.ckpt()` (this object's implicit syntax): identical runtime
  * behavior to `localCheckpoint()` — the plan is already computed by
  * the eager checkpoint itself, so capture adds no planning work — but
  * when the audit flag is on, the PRE-checkpoint physical plan is
  * recorded for the gate to sweep with the same hazard predicates it
  * applies to final plans. Recording is OFF by default (zero overhead
  * and zero retained references in production); PlanAuditSpec turns it
  * on around each registered query body.
  *
  * Thread-safety: the record buffer is thread-local — checkpoint
  * actions execute on the thread that builds the query (including Mv
  * builds, which serialize under the registry lock on the caller's
  * thread), so a recording session never observes another thread's
  * checkpoints.
  */
object Ckpt {
  private val buffer =
    new ThreadLocal[scala.collection.mutable.ArrayBuffer[(String, SparkPlan)]]()

  /** Run `body` with plan capture on (this thread only); returns
    * (body result, every (tag, pre-checkpoint plan) captured). */
  def record[A](body: => A): (A, Seq[(String, SparkPlan)]) = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, SparkPlan)]
    buffer.set(buf)
    try { val a = body; (a, buf.toSeq) }
    finally buffer.remove()
  }

  /** Checkpoint `df`, capturing its pre-checkpoint physical plan when a
    * `record` scope is active on this thread. */
  def apply(df: DataFrame, tag: String = ""): DataFrame = df.ckpt(tag)

  implicit class CkptOps[T](private val ds: Dataset[T]) extends AnyVal {
    def ckpt(tag: String = ""): Dataset[T] = {
      val buf = buffer.get()
      if (buf != null) buf += ((tag, ds.queryExecution.sparkPlan))
      ds.localCheckpoint()
    }
  }
}
