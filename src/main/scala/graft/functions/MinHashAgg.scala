package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash signature aggregator: 64 permutation slots built
  * in a single mutable buffer per group instead of 64 separate `min`
  * aggregate columns — the custom-aggregator shape (SURVEY.md §4) for
  * sketches at scale. The per-slot hash is bit-identical to the
  * builtin `xxhash64(shingle, lit(i))` (seed-42 chain), so signatures
  * match the composed formulation exactly.
  */
object MinHashAgg extends Aggregator[(Long, String), Array[Long], Array[Long]] {
  val NumHashes = 64

  /** hash chain of the builtin XxHash64(shingle, lit(i)): seed 42 →
    * string → INT literal (lit(i) is IntegerType). */
  def slotHash(shingle: UTF8String, slot: Int): Long = {
    val h1 = XxHash64Function.hash(shingle, StringType, 42L)
    XxHash64Function.hash(slot, IntegerType, h1)
  }

  override def zero: Array[Long] = Array.fill(NumHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], in: (Long, String)): Array[Long] = {
    val s = UTF8String.fromString(in._2)
    val h1 = XxHash64Function.hash(s, StringType, 42L)
    var i = 0
    while (i < NumHashes) {
      val h = XxHash64Function.hash(i, IntegerType, h1)
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < NumHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
