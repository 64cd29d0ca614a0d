package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters aggregate — the third classic mergeable
  * sketch next to HLL (q21) and the KLL-style percentiles (q25): find
  * every item whose frequency exceeds N/(k+1) in ONE pass with O(k)
  * state per group, however large N is.
  *
  * Exact frequent-items at 100 TB needs a full (item, count) groupBy —
  * a vocabulary-sized shuffle — when all a pipeline usually wants is
  * "which tokens/domains/shingles dominate". The MG summary keeps at
  * most `k` counters; an unseen item evicts weight from ALL counters
  * instead of growing the map. Summaries MERGE (Agarwal et al.,
  * "Mergeable Summaries", PODS'12): add counts item-wise, then subtract
  * the (k+1)-largest count from every counter and drop the non-positive
  * ones — so the map side partially aggregates before the exchange and
  * what shuffles is one ≤ k-entry summary per (group, partition), never
  * the items.
  *
  * Guarantee (spec-pinned): every item with true count > N/(k+1) is
  * present, and each reported estimate satisfies
  * `est ≤ true ≤ est + N/(k+1)`. The summary's exact contents depend on
  * merge order (inherent to MG) — the guarantee does not. */
case class FrequentItems(
    itemExpr: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MgBuffer] with UnaryLike[Expression] {

  require(k > 0, s"frequent_items needs k > 0, got $k")

  override def child: Expression = itemExpr

  // Analysis-time contract: the item must be a string. Without this, a
  // non-string column surfaces as an executor ClassCastException inside
  // update() instead of a clear AnalysisException. (AbstractDataType is
  // private[sql], so the check lives here rather than in inputTypes;
  // the builders below coerce with an explicit cast first.)
  override def checkInputDataTypes(): TypeCheckResult =
    if (itemExpr.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"frequent_items requires a STRING item, got ${itemExpr.dataType.sql}")

  override def dataType: DataType = FrequentItems.resultType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(k)

  override def update(buf: MgBuffer, input: InternalRow): MgBuffer = {
    val v = itemExpr.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(a: MgBuffer, b: MgBuffer): MgBuffer = { a.mergeIn(b); a }

  override def eval(buf: MgBuffer): Any = {
    // deterministic presentation: estimate desc, item asc
    val entries = buf.entries.toArray.sortBy { case (item, est) => (-est, item) }
    new GenericArrayData(entries.map { case (item, est) =>
      val row = new GenericInternalRow(2)
      row.update(0, UTF8String.fromString(item))
      row.update(1, est)
      row
    })
  }

  override def serialize(buf: MgBuffer): Array[Byte] = {
    val entries = buf.entries.toArray
    val payload = entries.map { case (s, c) =>
      (s.getBytes(StandardCharsets.UTF_8), c)
    }
    val bb = ByteBuffer.allocate(4 + payload.map(12 + _._1.length).sum)
    bb.putInt(payload.length)
    payload.foreach { case (bytes, c) =>
      bb.putInt(bytes.length); bb.put(bytes); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new MgBuffer(k)
    var j = 0
    while (j < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.put(new String(b, StandardCharsets.UTF_8), bb.getLong)
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FrequentItems =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FrequentItems =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FrequentItems =
    copy(itemExpr = newChild)
}

/** Mutable Misra–Gries summary: ≤ k counters. */
final class MgBuffer(val k: Int) {
  private val counts = mutable.HashMap.empty[String, Long]

  def entries: Iterator[(String, Long)] = counts.iterator

  /** Classic MG step: known item increments; free slot inserts; a full
    * map decrements EVERY counter (dropping zeros) instead of growing. */
  def add(item: String): Unit = {
    counts.get(item) match {
      case Some(c) => counts.update(item, c + 1)
      case None if counts.size < k => counts.update(item, 1L)
      case None => decrementAll(1L)
    }
  }

  /** Raw slot restore for deserialization (counts are pre-decremented
    * summaries, not raw observations). */
  def put(item: String, c: Long): Unit = counts.update(item, c)

  /** Mergeable-summaries merge: item-wise count addition, then if the
    * union exceeds k counters, subtract the (k+1)-largest count from
    * every counter and drop the non-positive — the union is again a
    * valid MG summary of the combined stream. */
  def mergeIn(other: MgBuffer): Unit = {
    other.counts.foreach { case (item, c) =>
      counts.update(item, counts.getOrElse(item, 0L) + c)
    }
    if (counts.size > k) {
      val kth = counts.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      decrementAll(kth)
    }
  }

  private def decrementAll(by: Long): Unit = {
    val dead = mutable.ArrayBuffer.empty[String]
    counts.keysIterator.foreach { item =>
      val c = counts(item) - by
      if (c <= 0) dead += item else counts.update(item, c)
    }
    dead.foreach(counts.remove)
  }
}

object FrequentItems {
  val resultType: ArrayType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)

  import org.apache.spark.sql.GraftColumnShim

  /** Aggregate column: Misra–Gries summary of `item` with ≤ `k`
    * counters, as array&lt;struct&lt;item, est&gt;&gt; sorted
    * (est desc, item asc). Every item with frequency &gt; N/(k+1) is
    * guaranteed present; `est ≤ true ≤ est + N/(k+1)`. */
  def frequent_items(item: Column, k: Int): Column =
    GraftColumnShim.column(
      // identity casts are erased by SimplifyCasts; non-strings coerce
      FrequentItems(Cast(GraftColumnShim.expression(item), StringType), k)
        .toAggregateExpression())
}
