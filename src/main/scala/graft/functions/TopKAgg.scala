package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded per-group top-k aggregate — the ranking shape every ANN
  * path needs at 100 TB.
  *
  * `row_number() OVER (PARTITION BY query_id ORDER BY score)` shuffles
  * EVERY scored row into |queries| partitions before discarding all
  * but k — on a corpus×queries scoring pass that is a skewed,
  * corpus-sized exchange. This aggregate keeps a size-bounded buffer
  * of the best (score desc, id asc) entries per group, and because it
  * is a [[TypedImperativeAggregate]] the map side partially aggregates
  * BEFORE the exchange: what shuffles is one ≤ k-entry buffer per
  * (group, input partition), never the scored rows themselves. The
  * reduce side merges buffers and emits the final sorted top-k array.
  *
  * Determinism: ordering is total — primary score descending,
  * ties broken by id ascending — so output is independent of row
  * arrival order and partitioning (asserted in TopKAggSpec by
  * comparing single-partition and many-partition runs bit-for-bit).
  */
case class BoundedTopK(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] with BinaryLike[Expression] {

  require(k > 0, s"top_k_by needs k > 0, got $k")

  override def left: Expression = scoreExpr
  override def right: Expression = idExpr

  override def dataType: DataType = BoundedTopK.resultType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    // null score or id: no defined rank position — skip the row
    // (mirrors how a window over a null-filtered score would rank)
    if (s != null && i != null)
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = { a.addAll(b); a }

  override def eval(buf: TopKBuffer): Any = {
    val top = buf.sortedTop()
    new GenericArrayData(top.map { case (s, i) =>
      val row = new GenericInternalRow(2)
      row.update(0, i)
      row.update(1, s)
      row
    })
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val top = buf.sortedTop()
    val bb = ByteBuffer.allocate(4 + top.length * 16)
    bb.putInt(top.length)
    top.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var j = 0
    while (j < n) { buf.add(bb.getDouble, bb.getLong); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BoundedTopK =
    copy(scoreExpr = newLeft, idExpr = newRight)
}

/** Mutable bounded buffer: appends are O(1); when occupancy hits 4×k
  * the buffer compacts (sort + truncate to k), so memory stays O(k)
  * per group and total work is O(n log k) amortized. */
final class TopKBuffer(val k: Int) {
  private var scores = new Array[Double](math.min(4 * k, 64))
  private var ids = new Array[Long](scores.length)
  private var n = 0

  // (score desc, id asc) — the one total order every caller ranks by
  private def lt(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  /** kth-best threshold short-circuit: once the buffer holds ≥ k
    * entries its compacted prefix bounds what can still matter. Kept
    * simple — compaction enforces the bound; adds stay branch-light. */
  def add(score: Double, id: Long): Unit = {
    if (n == scores.length) {
      if (n >= 4 * k) compact()
      if (n == scores.length) grow()
    }
    scores(n) = score; ids(n) = id; n += 1
  }

  def addAll(other: TopKBuffer): Unit = {
    var j = 0
    while (j < other.n) { add(other.scores(j), other.ids(j)); j += 1 }
  }

  private def grow(): Unit = {
    scores = java.util.Arrays.copyOf(scores, scores.length * 2)
    ids = java.util.Arrays.copyOf(ids, ids.length * 2)
  }

  private def sortInPlace(): Unit = {
    val idx = (0 until n).toArray
    val sortedIdx = idx.sortWith((a, b) => lt(scores(a), ids(a), scores(b), ids(b)))
    val s2 = new Array[Double](scores.length)
    val i2 = new Array[Long](ids.length)
    var j = 0
    while (j < n) { s2(j) = scores(sortedIdx(j)); i2(j) = ids(sortedIdx(j)); j += 1 }
    scores = s2; ids = i2
  }

  private def compact(): Unit = {
    sortInPlace()
    n = math.min(n, k)
  }

  /** Final (score, id) list: best-first, length ≤ k. */
  def sortedTop(): Array[(Double, Long)] = {
    compact()
    (0 until n).map(j => (scores(j), ids(j))).toArray
  }
}

object BoundedTopK {
  /** Output element order mirrors the ranking: `id` first for the
    * caller's select, `score` along for the final column. */
  val resultType: ArrayType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)

  import org.apache.spark.sql.GraftColumnShim

  /** Aggregate column: top-`k` (score desc, id asc) entries per group
    * as a sorted array&lt;struct&lt;id, score&gt;&gt;. */
  def top_k_by(score: Column, id: Column, k: Int): Column =
    GraftColumnShim.column(
      BoundedTopK(GraftColumnShim.expression(score),
        GraftColumnShim.expression(id), k).toAggregateExpression())

  /** [[top_k_by]] that carries an arbitrary `payload` column with each
    * ranked entry — for top-N-per-group queries whose output needs
    * more than the ranking score (exact decimals, counts, names):
    * array&lt;struct&lt;id, score, payload&gt;&gt;, same (score desc,
    * id asc) order and the same bounded map-side state. */
  def top_k_with(score: Column, id: Column, payload: Column, k: Int): Column =
    GraftColumnShim.column(
      BoundedTopKPayload(GraftColumnShim.expression(score),
        GraftColumnShim.expression(id),
        GraftColumnShim.expression(payload), k).toAggregateExpression())
}

/** [[BoundedTopK]] with a payload column riding along each entry.
  * The payload is evaluated once per surviving row and stored in the
  * bounded buffer as UnsafeRow bytes (any DataType — decimals,
  * structs, strings), so the aggregate stays a single pass with
  * ≤ 4·k entries of state per group per partition. */
case class BoundedTopKPayload(
    scoreExpr: Expression,
    idExpr: Expression,
    payloadExpr: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKPayloadBuffer]
    with org.apache.spark.sql.catalyst.trees.TernaryLike[Expression] {

  require(k > 0, s"top_k_with needs k > 0, got $k")

  override def first: Expression = scoreExpr
  override def second: Expression = idExpr
  override def third: Expression = payloadExpr

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false),
    StructField("payload", payloadExpr.dataType, payloadExpr.nullable))),
    containsNull = false)
  override def nullable: Boolean = false

  // one reusable projection per task: payload value → UnsafeRow bytes.
  // The projection REUSES its result buffer across rows, and
  // UnsafeRow.getBytes returns that shared array un-copied whenever the
  // row exactly fills it — so the bytes MUST be copied out of the
  // row's region here, or every buffered entry ends up aliasing the
  // last-projected payload (caught by the many-rows-per-partition
  // regression in TopKAggSpec).
  @transient private lazy val toBytes =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(
      Array(payloadExpr.dataType))
  private def payloadBytes(v: Any): Array[Byte] = {
    val row = new GenericInternalRow(1)
    row.update(0, v)
    val u = toBytes(row)
    val out = new Array[Byte](u.getSizeInBytes)
    org.apache.spark.unsafe.Platform.copyMemory(
      u.getBaseObject, u.getBaseOffset,
      out, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, u.getSizeInBytes)
    out
  }

  override def createAggregationBuffer(): TopKPayloadBuffer = new TopKPayloadBuffer(k)

  override def update(buf: TopKPayloadBuffer, input: InternalRow): TopKPayloadBuffer = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long],
        payloadBytes(payloadExpr.eval(input)))
    buf
  }

  override def merge(a: TopKPayloadBuffer, b: TopKPayloadBuffer): TopKPayloadBuffer = {
    a.addAll(b); a
  }

  override def eval(buf: TopKPayloadBuffer): Any = {
    new GenericArrayData(buf.sortedTop().map { case (s, i, p) =>
      val payloadRow = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(1)
      payloadRow.pointTo(p, p.length)
      val row = new GenericInternalRow(3)
      row.update(0, i)
      row.update(1, s)
      row.update(2, payloadRow.get(0, payloadExpr.dataType))
      row
    })
  }

  override def serialize(buf: TopKPayloadBuffer): Array[Byte] = {
    val top = buf.sortedTop()
    val n = top.map(_._3.length + 20).sum
    val bb = ByteBuffer.allocate(4 + n)
    bb.putInt(top.length)
    top.foreach { case (s, i, p) =>
      bb.putDouble(s); bb.putLong(i); bb.putInt(p.length); bb.put(p)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKPayloadBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKPayloadBuffer(k)
    var j = 0
    while (j < n) {
      val s = bb.getDouble; val i = bb.getLong
      val p = new Array[Byte](bb.getInt)
      bb.get(p)
      buf.add(s, i, p)
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopKPayload =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopKPayload =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): BoundedTopKPayload =
    copy(scoreExpr = newFirst, idExpr = newSecond, payloadExpr = newThird)
}

/** [[TopKBuffer]] with payload bytes per entry — same compaction
  * strategy, same (score desc, id asc) total order. */
final class TopKPayloadBuffer(val k: Int) {
  private var entries = new Array[(Double, Long, Array[Byte])](math.min(4 * k, 64))
  private var n = 0

  private def lt(a: (Double, Long, Array[Byte]), b: (Double, Long, Array[Byte])): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  def add(score: Double, id: Long, payload: Array[Byte]): Unit = {
    if (n == entries.length) {
      if (n >= 4 * k) compact()
      if (n == entries.length)
        entries = java.util.Arrays.copyOf(entries, entries.length * 2)
    }
    entries(n) = (score, id, payload); n += 1
  }

  def addAll(other: TopKPayloadBuffer): Unit = {
    var j = 0
    while (j < other.n) {
      val e = other.entries(j)
      add(e._1, e._2, e._3)
      j += 1
    }
  }

  private def compact(): Unit = {
    val sorted = entries.take(n).sortWith(lt)
    n = math.min(n, k)
    java.util.Arrays.fill(entries.asInstanceOf[Array[AnyRef]], null)
    System.arraycopy(sorted, 0, entries, 0, n)
  }

  def sortedTop(): Array[(Double, Long, Array[Byte])] = {
    compact()
    entries.take(n)
  }
}
