package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Mutable buffer for element-wise vector mean: running count + per-dim
  * double sums. `sums` is empty until the first vector fixes the width.
  */
case class VecBuf(var n: Long, var sums: Array[Double])

/** Element-wise mean of fixed-width float vectors — the neighbor-feature
  * mean aggregation at the heart of the reference's streaming GNN
  * (`/root/reference/README.md:2` "Flink + DL4J"; GraphSAGE-mean,
  * Hamilton et al. 2017 §3.1). Registered via `functions.udaf`, so it runs
  * as a partial+final aggregate (map-side combine) — one shuffle of
  * 64-double buffers per group, never the raw vectors. That is the
  * property that lets it scale to 100 TB of embeddings.
  */
object VecMeanAgg extends Aggregator[Seq[Float], VecBuf, Seq[Double]] {
  override def zero: VecBuf = VecBuf(0L, Array.empty[Double])

  override def reduce(b: VecBuf, a: Seq[Float]): VecBuf = {
    if (a == null) return b
    if (b.sums.length < a.length) {
      // ragged input: grow the buffer (missing dims are implicit zeros)
      b.sums = java.util.Arrays.copyOf(b.sums, a.length)
    }
    var i = 0
    while (i < a.length) { b.sums(i) += a(i); i += 1 }
    b.n += 1
    b
  }

  override def merge(x: VecBuf, y: VecBuf): VecBuf = {
    val (dst, src) = if (x.sums.length >= y.sums.length) (x, y) else (y, x)
    var i = 0
    while (i < src.sums.length) { dst.sums(i) += src.sums(i); i += 1 }
    dst.n += src.n
    dst
  }

  override def finish(b: VecBuf): Seq[Double] =
    if (b.n == 0L) Seq.empty else b.sums.map(_ / b.n).toSeq

  override def bufferEncoder: Encoder[VecBuf] = Encoders.product[VecBuf]
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
}
