package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for vector math on `array<double>`
  * columns.
  *
  * The higher-order-function route (`aggregate(zip_with(...))`) is
  * declarative but interpreted per row — on an N²-pair similarity join
  * it dominates the runtime. A codegen'd binary expression turns the
  * dot product into a tight primitive loop inside WholeStageCodegen
  * (preference order (b) of the build brief: native Expression over
  * UDF). Summation is strict left-to-right, bit-identical to both the
  * higher-order fold and DuckDB's `list_aggregate(..., 'sum')`, so
  * oracle hash comparisons are unaffected.
  */
case class DoubleArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"array_dot requires array<double> inputs, got ${left.dataType} and ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fused symmetric-int8 quantize→dequantize of one `array<double>`
  * column — the s18 corpus transform (scale = max|x|/127,
  * deq[i] = floor(x[i]/scale + 0.5) · scale) as ONE codegen-friendly
  * pass instead of a four-deep higher-order-function chain
  * (array_max∘transform(abs), conditional transform floor, transform
  * ×scale), each level of which Catalyst evaluates with an
  * INTERPRETED lambda per row per element. Arithmetic is bit-identical
  * to the HOF chain: same IEEE ops in the same order, max with
  * java.lang.Double.compare (Spark's double ordering: NaN greatest,
  * -0.0 < 0.0), null elements propagate except in the scale-0 branch
  * (where the chain's `transform(v, _ => 0.0)` maps null slots to 0.0
  * too — replicated). Pinned against the chain in FunctionsSpec. */
case class Int8Dequantize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = child.dataType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"int8_dequantize requires array<double> input, got $other")
    }

  override def nullSafeEval(a: Any): Any =
    Int8Dequantize.dequant(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Int8Dequantize.dequant($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Int8Dequantize {
  /** Shared eval/codegen kernel (generated Java calls this statically). */
  def dequant(x: ArrayData): ArrayData = {
    val n = x.numElements()
    var m = 0.0
    var any = false
    var hasNull = false
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) hasNull = true
      else {
        val ax = math.abs(x.getDouble(i))
        if (!any || java.lang.Double.compare(ax, m) > 0) { m = ax; any = true }
      }
      i += 1
    }
    if (!any) {
      // array_max over no non-null elements is null → every code (and
      // product) in the chain is null
      new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Any](n))
    } else {
      val scale = m / 127.0
      if (scale == 0.0) {
        // the chain's zero-scale branch maps EVERY slot (nulls too) to
        // 0.0 · scale = 0.0
        org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray(new Array[Double](n))
      } else if (!hasNull) {
        val out = new Array[Double](n)
        i = 0
        while (i < n) {
          out(i) = math.floor(x.getDouble(i) / scale + 0.5) * scale
          i += 1
        }
        org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray(out)
      } else {
        val out = new Array[Any](n)
        i = 0
        while (i < n) {
          if (!x.isNullAt(i))
            out(i) = math.floor(x.getDouble(i) / scale + 0.5) * scale
          i += 1
        }
        new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
      }
    }
  }
}

object VectorFunctions {
  import org.apache.spark.sql.functions._

  import org.apache.spark.sql.GraftColumnShim

  /** Columns API wrapper: dot product of two array<double> columns. */
  def array_dot(a: Column, b: Column): Column =
    GraftColumnShim.column(DoubleArrayDot(
      GraftColumnShim.expression(a), GraftColumnShim.expression(b)))

  /** Fused int8 quantize→dequantize (see [[Int8Dequantize]]). */
  def int8_dequantize(c: Column): Column =
    GraftColumnShim.column(Int8Dequantize(GraftColumnShim.expression(c)))

  /** Cast a float/double array column to array<double>.
    *
    * Deliberately the `transform(_.cast)` spelling, NOT the plain
    * array cast `c.cast("array<double>")` — measured r18: the plain
    * Cast looks cheap to the optimizer, so CollapseProject inlines it
    * into every downstream consumer and the widened array gets
    * re-materialized per use instead of once per row; p09's dense
    * scorer went 3.5 s → 50 s warm with the plain cast (same combo
    * harness, repeat-confirmed), while the HOF spelling keeps the
    * projection boundary and evaluates the widening once. Element
    * semantics of both spellings are identical (exact float→double
    * widening, nulls preserved) — pinned in FunctionsSpec. */
  def as_double_array(c: Column): Column = transform(c, x => x.cast("double"))

  /** L2 norm — sqrt of self-dot (same fold order as the oracle). */
  def array_norm(c: Column): Column = sqrt(array_dot(c, c))
}
