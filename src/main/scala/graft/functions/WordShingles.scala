package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-3-gram shingles of a text column in one imperative
  * pass: trim → whitespace split → sliding 3-gram join → first-seen
  * distinct. Bit-compatible with the declarative chain
  * `array_distinct(transform(sequence(...), i -> concat_ws(" ",
  * element_at(t,i), ...)))` over `split(trim(text), "\\s+")` — which
  * routes every element through three interpreted higher-order-function
  * lambdas per shingle and dominated the dedup queries' runtime — and
  * with the DuckDB oracle (`list_distinct(list_transform(...))` over
  * `string_split_regex(trim(text), '\s+')`).
  *
  * Compatibility notes (each mirrors the Spark builtin exactly):
  *  - trim removes ASCII spaces (0x20) only, like `StringTrim`;
  *  - the split keeps leading/trailing empty tokens like Spark's
  *    `split(str, regex)` (limit -1), NOT Java's `String.split`;
  *  - texts with fewer than 3 tokens yield an empty array (callers
  *    need no `size(tokens) >= 3` pre-filter, so no expensive filter
  *    expression exists for pushdown to duplicate).
  */
case class WordShingles(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].trim().toString
    val toks = WordShingles.Whitespace.split(text, -1)
    if (toks.length < 3) return new GenericArrayData(Array.empty[Any])
    // LinkedHashSet: distinct keeping first-occurrence order, matching
    // array_distinct / DuckDB list_distinct
    val seen = new java.util.LinkedHashSet[String](toks.length * 2)
    var i = 0
    while (i <= toks.length - 3) {
      seen.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {
  private val Whitespace = Pattern.compile("\\s+")

  import org.apache.spark.sql.GraftColumnShim

  /** Distinct word-3-gram shingles of a string column. */
  def word_shingles(text: Column): Column =
    GraftColumnShim.column(WordShingles(GraftColumnShim.expression(text)))
}
