package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for the similarity-search hot path: the
  * integer-quantized dot product of two float vectors,
  * Σ floor(aᵢ·1000)·floor(bᵢ·1000), in ONE fused loop with full
  * whole-stage codegen.
  *
  * The composed built-in form — transform(quantize) → zip_with(multiply)
  * → aggregate(sum) — allocates two intermediate arrays per row pair; at
  * N×Q scored pairs (brute-force scoring of 100 TB of embeddings against
  * a broadcast query set) that allocation is the bottleneck. This
  * expression reads both ArrayData buffers directly and accumulates in a
  * register.
  *
  * Semantics notes: result is exact 64-bit integer arithmetic, identical
  * to the DuckDB oracle's SUM over quantized elements (see
  * graft.queries.SimQueries); null elements contribute 0; length
  * mismatch uses the common prefix.
  */
case class QuantizedDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // AbstractDataType is private[sql]; the inferred type conforms
  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "quantized_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (xs, ys) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i) && !ys.isNullAt(i)) {
        acc += math.floor(xs.getFloat(i).toDouble * 1000.0).toLong *
          math.floor(ys.getFloat(i).toDouble * 1000.0).toLong
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, i, acc) = (ctx.freshName("n"), ctx.freshName("i"), ctx.freshName("acc"))
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += ((long) java.lang.Math.floor(((double) $a.getFloat($i)) * 1000.0))
         |          * ((long) java.lang.Math.floor(((double) $b.getFloat($i)) * 1000.0));
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedDot =
    copy(left = newLeft, right = newRight)
}

/** Column-API wrappers for the native vector expressions. */
object VectorFunctions {
  def quantizedDot(a: Column, b: Column): Column =
    GraftColumnBridge.column(QuantizedDot(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Squared quantized norm: quantizedDot(v, v). */
  def quantizedNorm(v: Column): Column = quantizedDot(v, v)
}
