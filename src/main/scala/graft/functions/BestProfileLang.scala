package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row n-gram language-ID argmax over a fitted trigram profile:
  * walks the (already-lowercased) text's trigrams once, accumulates
  * Σ weight per profile language via a hash lookup, and returns the
  * best language (max score, ties broken language-ascending) — or null
  * when the document shares no trigram with any profile (the inner-join
  * contract of the DataFrame scoring form).
  *
  * This is the same shape as the IVF per-row centroid argmax: the
  * profile is tiny (|langs| × K grams — K=200), so it rides into the
  * task as expression state ("broadcast literal") and prediction is a
  * single narrow map over the corpus — no per-occurrence explode, no
  * join, no aggregation shuffle. The DataFrame explode+join scoring it
  * replaces shuffled ~3 corpus-scale row sets per prediction pass.
  *
  * `matched` is tracked separately from the score: an integer weight
  * can legitimately be 0 when a language's total gram count exceeds
  * the 10⁹ weight scale, and a matched-zero score must still beat
  * "no shared gram at all".
  *
  * @param langs    profile languages, ASCENDING (tie-break order)
  * @param profile  (gram, flattened (langIndex, weight) pairs)
  */
case class BestProfileLang(child: Expression, langs: Seq[String],
                           profile: Seq[(String, Seq[(Int, Long)])])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  @transient private lazy val langU8: Array[UTF8String] =
    langs.map(UTF8String.fromString).toArray

  // gram -> [idx0, w0, idx1, w1, ...] (flattened to avoid per-entry boxes)
  @transient private lazy val lut: java.util.HashMap[UTF8String, Array[Long]] = {
    val m = new java.util.HashMap[UTF8String, Array[Long]](profile.size * 2)
    profile.foreach { case (gram, entries) =>
      val packed = new Array[Long](entries.size * 2)
      var i = 0
      entries.foreach { case (idx, w) => packed(i) = idx.toLong; packed(i + 1) = w; i += 2 }
      m.put(UTF8String.fromString(gram), packed)
    }
    m
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val bytes = s.getBytes
    val nBytes = bytes.length
    val scores = new Array[Long](langU8.length)
    val matched = new Array[Boolean](langU8.length)
    var any = false
    // one pass over UTF-8 bytes: char starts, then zero-copy 3-char slices
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
    var c = 0
    while (c < nChars - 2) {
      val packed = lut.get(UTF8String.fromBytes(bytes, offs(c), offs(c + 3) - offs(c)))
      if (packed != null) {
        any = true
        var j = 0
        while (j < packed.length) {
          val idx = packed(j).toInt
          scores(idx) += packed(j + 1)
          matched(idx) = true
          j += 2
        }
      }
      c += 1
    }
    if (!any) return null
    // argmax, langs ascending: strict > keeps the smallest lang on ties
    var best = -1
    var k = 0
    while (k < scores.length) {
      if (matched(k) && (best < 0 || scores(k) > scores(best))) best = k
      k += 1
    }
    langU8(best)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BestProfileLang {
  import org.apache.spark.sql.GraftColumnShim

  /** Best profile language of a lowercased text column, from a collected
    * (profile_lang, gram, weight) profile. */
  def best_profile_lang(textLower: Column, langs: Seq[String],
                        profile: Seq[(String, Seq[(Int, Long)])]): Column =
    GraftColumnShim.column(
      BestProfileLang(GraftColumnShim.expression(textLower), langs, profile))
}
