package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe of a string column against a serialized
  * `org.apache.spark.util.sketch.BloomFilter` — the broadcast
  * runtime-filter pattern for probing a FIXED small set (a held-out
  * benchmark, a blocklist) from a corpus-sized scan without any join:
  * the filter rides to every task as a few-MB reference object inside
  * the expression, each probe is k hash computations, and the scan
  * stays a narrow map. False positives are possible (callers follow
  * with an exact semi join on the survivors when exactness matters,
  * as `TextOps.t20BloomDecontam` does); false negatives are not, so a
  * downstream exact verify can only REMOVE rows, never miss one.
  *
  * Probes with `mightContainBinary` on the column's UTF-8 bytes,
  * which matches how the sketch's `putString`/`put(String)` inserted
  * them (both sides hash the UTF-8 encoding), so a filter built by
  * `DataFrame.stat.bloomFilter` over the same column agrees exactly.
  */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType

  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val bf: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

  override def nullSafeEval(input: Any): Any =
    bf.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContain {

  import org.apache.spark.sql.GraftColumnShim

  /** True when `text` might be a member of the serialized filter. */
  def bloom_might_contain(text: Column, filterBytes: Array[Byte]): Column =
    GraftColumnShim.column(
      BloomMightContain(GraftColumnShim.expression(text), filterBytes))

  /** Serialize a sketch BloomFilter for embedding in the expression. */
  def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }
}
