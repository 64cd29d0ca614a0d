package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** 64-bit SimHash of a token array in a single expression.
  *
  * Replaces the declarative formulation (explode + 64 conditional sum
  * aggregates + 64-way bit assembly) with one pass per document: for
  * each token take `xxhash64(token, seed=42)` (identical to Spark's
  * `xxhash64` builtin, so results match the composed version), add ±1
  * per bit position, emit the sign bits. One row in, one long out — no
  * explode, no shuffle, no 64-column aggregation state.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val tok = arr.getUTF8String(i)
        val h = XxHash64Function.hash(tok, StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) fp |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(fp)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  import org.apache.spark.sql.GraftColumnShim

  /** SimHash of an array<string> token column. */
  def simhash64(tokens: Column): Column =
    GraftColumnShim.column(SimHash64(GraftColumnShim.expression(tokens)))
}
