package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document character-trigram term frequencies as one
  * `map<string,bigint>` built in a single O(len) pass — the
  * pre-aggregated form of `explode(char_trigrams(text))` followed by a
  * `groupBy(doc, tri).count()`: the count happens inside the row, so
  * no per-occurrence rows exist and the downstream shuffle carries one
  * entry per DISTINCT trigram per document. Used by the trigram-LM
  * scorer ([[graft.analytics.TextOps.t21LmPerplexity]]), where the
  * occurrence-level aggregate was the dominant cost.
  *
  * Trigram char semantics are identical to [[CharTrigrams]] (UTF-8
  * code points, zero-copy byte-range slices); under 3 chars yields an
  * empty map. Map entries are in first-occurrence order, a
  * deterministic function of the text alone.
  */
case class TrigramCounts(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)

  override def prettyName: String = "trigram_counts"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val bytes = s.getBytes
    val nBytes = bytes.length
    val offs = new Array[Int](nBytes + 1)
    var nChars = 0
    var i = 0
    while (i < nBytes) {
      offs(nChars) = i
      val b = bytes(i) & 0xFF
      i += (if (b < 0x80) 1 else if (b < 0xE0) 2 else if (b < 0xF0) 3 else 4)
      nChars += 1
    }
    offs(nChars) = nBytes
    if (nChars < 3)
      return new ArrayBasedMapData(
        new GenericArrayData(Array.empty[Any]), new GenericArrayData(Array.empty[Any]))
    val counts = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
    var c = 0
    while (c < nChars - 2) {
      val from = offs(c)
      val len = offs(c + 3) - from
      val gram = new Array[Byte](len)
      System.arraycopy(bytes, from, gram, 0, len)
      val key = UTF8String.fromBytes(gram)
      val slot = counts.get(key)
      if (slot == null) counts.put(key, Array(1L)) else slot(0) += 1L
      c += 1
    }
    val keys = new Array[Any](counts.size())
    val vals = new Array[Any](counts.size())
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      keys(j) = e.getKey
      vals(j) = e.getValue()(0)
      j += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TrigramCounts {

  import org.apache.spark.sql.GraftColumnShim

  /** map<trigram, count> of a text column in one pass. */
  def trigram_counts(text: Column): Column =
    GraftColumnShim.column(TrigramCounts(GraftColumnShim.expression(text)))
}
