package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Sliding character trigrams of a (already-lowercased) text column in
  * one imperative pass — bit-compatible with the declarative chain
  * `transform(sequence(1, length(s) - 2), i -> substring(s, i, 3))`
  * (empty array under 3 chars), which routes every gram through an
  * interpreted higher-order-function lambda whose `substring` re-walks
  * the string from offset 0 each call (O(len²) per document). Here the
  * UTF-8 byte buffer is walked once to record per-character byte
  * offsets, then each trigram is a zero-copy byte-range slice —
  * O(len) per document.
  *
  * Character semantics match Spark's `substring`/`length` exactly:
  * both count UTF-8 code points (UTF8String.numChars), not UTF-16
  * units, so supplementary-plane characters are one "char" here as in
  * the SQL form and in the DuckDB oracle.
  */
case class CharTrigrams(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val bytes = s.getBytes
    val nBytes = bytes.length
    // one pass: byte offset of every character start (+ terminal offset)
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
    if (nChars < 3) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](nChars - 2)
    var c = 0
    while (c < nChars - 2) {
      val from = offs(c)
      val len = offs(c + 3) - from
      val gram = new Array[Byte](len)
      System.arraycopy(bytes, from, gram, 0, len)
      out(c) = UTF8String.fromBytes(gram)
      c += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharTrigrams {
  import org.apache.spark.sql.GraftColumnShim

  /** Sliding 3-char grams of a string column (callers lowercase first). */
  def char_trigrams(text: Column): Column =
    GraftColumnShim.column(CharTrigrams(GraftColumnShim.expression(text)))
}
