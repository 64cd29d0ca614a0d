package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, IntegerType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document repetition statistics in one imperative pass:
  * `struct(n_tokens, n_distinct, n_bigrams, top_bigram)` over the
  * whitespace tokens of a text column.
  *
  * Replaces the declarative t12 formulation — explode every bigram,
  * hash-aggregate (doc_id, bigram) counts, re-aggregate per doc —
  * whose two corpus-scale shuffles carried one row PER BIGRAM
  * OCCURRENCE. The counts a repetition metric needs are per-document
  * quantities, computable inside the row: token count, distinct-token
  * count (duplicate-word fraction), bigram count, and the top bigram's
  * occurrence count (top-bigram fraction). One row in, four ints out —
  * the per-doc aggregation shuffles disappear and only the final
  * per-source rollup remains.
  *
  * Tokenization matches `split(trim(text), "\s+")` Spark semantics
  * exactly (ASCII-space trim, limit -1 keeping boundary empties) —
  * the same contract as [[WordShingles]] — and bigrams are the
  * space-joined adjacent token pairs the previous
  * `concat_ws(" ", t[i], t[i+1])` produced, so the DuckDB oracle is
  * unchanged.
  */
case class BigramStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BigramStats.Schema

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].trim().toString
    val toks = BigramStats.Whitespace.split(text, -1)
    val n = toks.length
    val distinct = new java.util.HashSet[String](n * 2)
    var i = 0
    while (i < n) { distinct.add(toks(i)); i += 1 }
    var top = 0
    if (n >= 2) {
      val counts = new java.util.HashMap[String, Integer](n * 2)
      i = 0
      while (i < n - 1) {
        val bg = toks(i) + " " + toks(i + 1)
        val c = counts.merge(bg, Integer.valueOf(1), (a, b) => Integer.valueOf(a + b))
        if (c > top) top = c
        i += 1
      }
    }
    InternalRow(n, distinct.size(), math.max(n - 1, 0), top)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BigramStats {
  private val Whitespace = Pattern.compile("\\s+")

  val Schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("n_bigrams", IntegerType, nullable = false),
    StructField("top_bigram", IntegerType, nullable = false)))

  import org.apache.spark.sql.GraftColumnShim

  /** Repetition stats struct of a string column. */
  def bigram_stats(text: Column): Column =
    GraftColumnShim.column(BigramStats(GraftColumnShim.expression(text)))
}
