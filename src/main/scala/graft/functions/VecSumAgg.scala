package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise sum of fixed-length double arrays — the mergeable
  * sufficient-statistics shape for distributed moment computation
  * (PCA's mean + Gram matrix): each partition reduces its rows into
  * ONE length-m buffer and only the per-partition buffers reach the
  * merge, never the rows. This is what keeps a second-moment pass at
  * 100 TB a single narrow scan: the exchange carries `partitions × m`
  * doubles regardless of row count (m = d² for a Gram matrix — ~32 KB
  * per partition at d = 64).
  *
  * The alternative formulations don't survive scale: `posexplode` to
  * (index, value) rows multiplies the corpus by m before the shuffle,
  * and m separate `sum` columns make Catalyst build an m-wide
  * aggregate schema (codegen blowup beyond a few hundred columns).
  *
  * The buffer is sized lazily from the first row so one aggregator
  * serves any dimension; ragged inputs fail fast rather than silently
  * truncating.
  */
object VecSumAgg extends Aggregator[Seq[Double], Array[Double], Array[Double]] {

  override def zero: Array[Double] = Array.emptyDoubleArray

  override def reduce(buf: Array[Double], in: Seq[Double]): Array[Double] = {
    if (in == null) buf
    else {
      val b = if (buf.length == 0) new Array[Double](in.length) else buf
      require(in.length == b.length,
        s"vec_sum over ragged arrays: ${in.length} vs ${b.length}")
      var i = 0
      while (i < b.length) { b(i) += in(i); i += 1 }
      b
    }
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    if (a.length == 0) b
    else if (b.length == 0) a
    else {
      require(a.length == b.length,
        s"vec_sum merge over ragged buffers: ${a.length} vs ${b.length}")
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
  }

  override def finish(buf: Array[Double]): Array[Double] = buf

  override def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
}
