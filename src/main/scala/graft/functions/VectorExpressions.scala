package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
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

/** Integer squared L2 distance between two already-quantized long
  * vectors, Σ (aᵢ−bᵢ)², in one fused codegen'd loop — the k-means /
  * IVF-assignment hot path. The composed zip_with→aggregate form is an
  * interpreted higher-order function (lambda evaluation + boxing per
  * element); at corpus × centroids assignment pairs that interpretation
  * dominates the whole training round. Same conventions as
  * QuantizedDot: null elements contribute 0, length mismatch uses the
  * common prefix; exact 64-bit arithmetic identical to the oracle's
  * SUM((qval-cval)*(qval-cval)).
  */
case class QuantizedL2(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "quantized_l2"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (xs, ys) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i) && !ys.isNullAt(i)) {
        val d = xs.getLong(i) - ys.getLong(i)
        acc += d * d
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, i, acc, d) = (ctx.freshName("n"), ctx.freshName("i"),
        ctx.freshName("acc"), ctx.freshName("d"))
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    long $d = $a.getLong($i) - $b.getLong($i);
         |    $acc += $d * $d;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedL2 =
    copy(left = newLeft, right = newRight)
}

/** All hyperplane LSH bits of one embedding in a single fused pass: bit
  * j of the result is set iff Σ floor(vᵢ·1000)·signs[j][i] > 0. The
  * composed form pays one interpreted HOF aggregate per bit per row
  * (16 array walks); this walks the vector once per bit in tight
  * codegen'd long arithmetic via a static kernel. Bit semantics are
  * identical to the oracle's per-(j,i) sign-matrix SUM (the ±1 signs
  * come from md5 parity — see graft.queries.SimQueries).
  */
case class HyperplaneSketch(child: Expression, signs: Array[Array[Long]])
    extends UnaryExpression with ExpectsInputTypes {
  require(signs.nonEmpty && signs.length <= 63, "1..63 hyperplanes")

  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sketch"

  override def nullSafeEval(in: Any): Any =
    HyperplaneSketch.sketch(in.asInstanceOf[ArrayData], signs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("signs", signs, "long[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HyperplaneSketch.sketch($c, $signsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSketch =
    copy(child = newChild)
}

object HyperplaneSketch {

  /** The canonical ±1 hyperplane matrix: md5 parity of "j:i" — no RNG,
    * reproducible in any engine with md5 (the oracle recomputes it as
    * CASE WHEN CAST(CONCAT('0x', SUBSTRING(md5(j||':'||i),1,15)) AS
    * BIGINT) % 2 = 0 THEN 1 ELSE -1 END). One definition shared by the
    * similarity queries and the SQL function registration.
    */
  def md5Signs(bits: Int, dim: Int): Array[Array[Long]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(bits, dim) { (j, i) =>
      val hex = md.digest(s"$j:$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1L else -1L
    }
  }

  /** Static kernel shared by eval and codegen. Null elements contribute
    * 0 to every plane (matching the HOF form's zip_with-over-null = 0).
    */
  def sketch(v: ArrayData, signs: Array[Array[Long]]): Long = {
    val n = v.numElements()
    var mask = 0L
    var j = 0
    while (j < signs.length) {
      val row = signs(j)
      val m = math.min(n, row.length)
      var acc = 0L
      var i = 0
      while (i < m) {
        if (!v.isNullAt(i)) {
          acc += math.floor(v.getFloat(i).toDouble * 1000.0).toLong * row(i)
        }
        i += 1
      }
      if (acc > 0) mask |= 1L << j
      j += 1
    }
    mask
  }
}

/** Column-API wrappers for the native vector expressions. */
object VectorFunctions {
  def quantizedDot(a: Column, b: Column): Column =
    GraftColumnBridge.column(QuantizedDot(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Squared quantized norm: quantizedDot(v, v). */
  def quantizedNorm(v: Column): Column = quantizedDot(v, v)

  def quantizedL2(a: Column, b: Column): Column =
    GraftColumnBridge.column(QuantizedL2(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def hyperplaneSketch(v: Column, signs: Array[Array[Long]]): Column =
    GraftColumnBridge.column(
      HyperplaneSketch(GraftColumnBridge.expression(v), signs))

  /** THE quantization of the exactness contract: one embedding
    * coordinate onto the integer lattice, floor(double(x) * 1000).
    * Every face that computes lattice distances (the q_sim_ann query
    * family, the warehouse ANN index, PQ coordinates) must quantize
    * through here — bit-identical inputs are what make index-side and
    * query-side distances, and the DuckDB oracles, hash-exact.
    */
  def latticeVal(x: Column): Column =
    org.apache.spark.sql.functions.floor(
      x.cast(org.apache.spark.sql.types.DoubleType) * 1000)
      .cast(org.apache.spark.sql.types.LongType)

  /** Whole-embedding form of [[latticeVal]]: array<float> -> the
    * quantized array<long> the native kernels consume.
    */
  def lattice(emb: Column): Column =
    org.apache.spark.sql.functions.transform(emb, latticeVal(_))
}
