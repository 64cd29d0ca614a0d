package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** 64-slot MinHash signature of a shingle array in a single expression.
  *
  * Replaces the explode → groupBy(doc_id) → 64×min aggregation
  * formulation with one pass per document over its (already distinct)
  * shingle array: hash each shingle once with `xxhash64(shingle)`
  * (seed 42, identical to the builtin), then chain each of the 64 slot
  * indices through `xxhash64` exactly as the builtin
  * `xxhash64(shingle, lit(i))` would — so signatures are bit-identical
  * to the composed `min(xxhash64(shingle, lit(i)))` columns and to
  * [[MinHashAgg]] (FunctionsSpec asserts all three agree). One row in,
  * 64 longs out — no explode, no shuffle, no aggregation state: the
  * signature pass is a narrow map over the corpus, which is the only
  * shape that matters at 100 TB.
  */
case class MinHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // null for null OR empty input (see nullSafeEval)
  override def nullable: Boolean = true

  /** Empty shingle arrays (documents under 3 tokens) yield a NULL
    * signature, not an all-MaxValue one: every empty doc would share
    * the identical degenerate signature and band-hash into one giant
    * false-candidate bucket. Callers filter `isNotNull` (a cheap
    * attribute filter) before banding. */
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val sig = Array.fill(MinHash64.NumHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val shingle = arr.getUTF8String(i)
        // seed-42 chain of the builtin XxHash64(shingle, lit(i)):
        // hash the string once, then chain the INT slot index
        val h1 = XxHash64Function.hash(shingle, StringType, 42L)
        var s = 0
        while (s < MinHash64.NumHashes) {
          val h = XxHash64Function.hash(s, IntegerType, h1)
          if (h < sig(s)) sig(s) = h
          s += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHash64 {
  val NumHashes = 64

  import org.apache.spark.sql.GraftColumnShim

  /** 64-slot MinHash signature of an array<string> shingle column. */
  def minhash64(shingles: Column): Column =
    GraftColumnShim.column(MinHash64(GraftColumnShim.expression(shingles)))
}
