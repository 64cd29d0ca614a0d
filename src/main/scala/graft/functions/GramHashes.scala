package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling u64 hash of EVERY `k`-char gram of a text column in one
  * O(len) pass — element `i` is the hash of the gram at 1-based char
  * position `i + 1`, so `posexplode` recovers (position, gram-key)
  * pairs without ever materializing a gram string. This is the scale
  * key for exact-substring dedup ([[graft.analytics.Dedup.d09ExactSubstr]]):
  * grouping and joining on an 8-byte long instead of a k-byte string
  * cuts the shuffled gram table by ~k× and makes the hash-aggregate
  * key fixed-width.
  *
  * Two equal grams always hash equal (Rabin-Karp over code points is
  * position-independent); two different grams collide with birthday
  * probability in 2^64, which for dedup merely over-marks a span as
  * duplicated — the conservative direction — at a ~2^-64 per-pair
  * rate. The d09 oracle (DuckDB computes with real substrings)
  * hash-matches at every SF, attesting no collision materializes on
  * the gate data.
  *
  * Character semantics match Spark `substring`: UTF-8 code points,
  * walked via the same byte-offset scan as [[CharTrigrams]]. Texts
  * shorter than `k` chars yield an empty array. Pure u64 wraparound
  * arithmetic — deterministic at any parallelism (cf.
  * [[WinnowFingerprints]], which winnows the same rolling family).
  */
case class GramHashes(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 2, "gram_hashes needs k >= 2")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "gram_hashes"

  private val Base = 0x100000001b3L // FNV-ish odd multiplier, full-width diffusion
  // Base^(k-1) for the roll-out term, u64 wraparound
  private val BaseK: Long = {
    var b = 1L
    var i = 0
    while (i < k - 1) { b *= Base; i += 1 }
    b
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val bytes = s.getBytes
    val nBytes = bytes.length
    // code points, one pass (same walk as CharTrigrams)
    val cps = new Array[Int](nBytes)
    var nChars = 0
    var i = 0
    while (i < nBytes) {
      val b = bytes(i) & 0xFF
      val w = if (b < 0x80) 1 else if (b < 0xE0) 2 else if (b < 0xF0) 3 else 4
      var cp = b
      var j = 1
      while (j < w && i + j < nBytes) { cp = (cp << 8) | (bytes(i + j) & 0xFF); j += 1 }
      cps(nChars) = cp
      nChars += 1
      i += w
    }
    val n = nChars - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n)
    var h = 0L
    i = 0
    while (i < k) { h = h * Base + cps(i); i += 1 }
    out(0) = h
    i = 1
    while (i < n) {
      h = (h - cps(i - 1) * BaseK) * Base + cps(i + k - 1)
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramHashes {

  import org.apache.spark.sql.GraftColumnShim

  /** Hashes of all k-char grams; element i = gram at char position i+1. */
  def gram_hashes(text: Column, k: Int): Column =
    GraftColumnShim.column(GramHashes(GraftColumnShim.expression(text), k))
}
