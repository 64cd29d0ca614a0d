package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting",
  * SIGMOD 2003) in one imperative pass: normalize (lowercase,
  * whitespace runs collapsed to one space, trimmed) → Rabin-Karp
  * rolling hash over all `k`-char grams → per window of `window`
  * consecutive hashes keep the minimum (rightmost on ties — the
  * paper's "robust winnowing") → first-seen-distinct selected hashes.
  *
  * The selection guarantee: any substring match of at least
  * `t = k + window - 1` normalized chars between two documents yields
  * at least one shared fingerprint, while only ~2/(window+1) of all
  * gram hashes are kept — the local-similarity dedup tier that catches
  * copied passages MinHash's global signature dilutes away on long
  * documents. Complements the reference's exact-key dedup
  * (`/root/reference/src/aerovaldb/jsondb/cache.py` keys whole files);
  * here the unit is a passage, not a file.
  *
  * Pure u64 wraparound arithmetic — deterministic at any parallelism.
  * Texts shorter than `k` after normalization yield an empty array.
  */
case class WinnowFingerprints(child: Expression, k: Int, window: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 2 && window >= 1, "winnow_fingerprints needs k >= 2, window >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val Base = 257L
  // Base^(k-1) for the roll-out term, u64 wraparound
  private val BaseK: Long = {
    var b = 1L
    var i = 0
    while (i < k - 1) { b *= Base; i += 1 }
    b
  }

  override def nullSafeEval(input: Any): Any = {
    val s = WinnowFingerprints.Whitespace
      .matcher(input.asInstanceOf[UTF8String].trim().toLowerCase.toString)
      .replaceAll(" ")
    val n = s.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])

    // all k-gram rolling hashes
    val hashes = new Array[Long](n)
    var h = 0L
    var i = 0
    while (i < k) { h = h * Base + s.charAt(i); i += 1 }
    hashes(0) = h
    i = 1
    while (i < n) {
      h = (h - s.charAt(i - 1) * BaseK) * Base + s.charAt(i + k - 1)
      hashes(i) = h
      i += 1
    }

    // robust winnowing: slide a window of `window` hashes, keep the
    // rightmost minimum; record each newly-selected position once
    val selected = new java.util.LinkedHashSet[java.lang.Long]()
    var minIdx = -1
    i = 0
    while (i < n) {
      val lo = i - window + 1
      if (minIdx < 0 || minIdx < lo) {
        // previous minimum slid out: rescan the current window
        minIdx = if (lo > 0) lo else 0
        var j = minIdx + 1
        while (j <= i) { if (hashes(j) <= hashes(minIdx)) minIdx = j; j += 1 }
        selected.add(hashes(minIdx))
      } else if (hashes(i) <= hashes(minIdx)) {
        minIdx = i
        selected.add(hashes(minIdx))
      }
      i += 1
    }

    val out = new Array[Any](selected.size())
    val it = selected.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next().longValue(); j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprints {
  private val Whitespace = Pattern.compile("\\s+")

  import org.apache.spark.sql.GraftColumnShim

  /** Distinct winnowing-selected k-gram hashes of a string column.
    * Matches of ≥ `k + window - 1` normalized chars are guaranteed to
    * share a fingerprint. */
  def winnow_fingerprints(text: Column, k: Int = 25, window: Int = 26): Column =
    GraftColumnShim.column(WinnowFingerprints(GraftColumnShim.expression(text), k, window))
}
