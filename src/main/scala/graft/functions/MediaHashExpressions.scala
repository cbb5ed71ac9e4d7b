package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Perceptual media hashing on the integer lattice — the image face of
  * the near-dup toolbox. dHash (difference hash — public algorithm:
  * resample to a 9x8 grayscale grid, emit one bit per horizontal
  * gradient) re-encodes, resizes and mildly re-compresses to nearly
  * the same 64 bits, where a byte digest (q_multimodal_dedup) only
  * catches byte-identical payloads.
  *
  * The DECODE step is the repo's multimodal stub discipline
  * (graft.multimodal.Multimodal: no codecs in this environment): the
  * payload bytes stand in for the decoded grayscale stream, and the
  * 9x8 grid is the same nearest-neighbor index resample the resize
  * stub uses — so the Spark-side shape (binary column in, 64-bit
  * lattice hash out, one fused codegen pass, no shuffle) is real, and
  * a real build swaps ONLY the byte source (decoded luma plane instead
  * of raw payload). Integer-only arithmetic, so the DuckDB oracle
  * replays the hash bit-for-bit from the same bytes.
  */
object MediaHash {

  /** 64-bit dHash of a payload: pixel(i) = payload[(i*len)/72] & 0xff
    * over the row-major 8x9 grid (i = 0..71), bit(r*8+c) = 1 iff
    * pixel(r,c) > pixel(r,c+1). Empty payload → 0 (no gradients).
    * Static so whole-stage codegen calls it directly.
    */
  def dhash64(payload: Array[Byte]): Long = {
    val len = payload.length
    if (len == 0) return 0L
    val px = new Array[Int](72)
    var i = 0
    // LONG index arithmetic: i * len overflows Int from ~30 MB payloads
    // (i=71 × 50e6 > Int.Max → negative index → scan-killing AIOOBE),
    // and multi-MB decoded planes are exactly the advertised use
    while (i < 72) {
      px(i) = payload(((i.toLong * len) / 72).toInt) & 0xff; i += 1
    }
    var h = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (px(r * 9 + c) > px(r * 9 + c + 1)) h |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    h
  }

  /** Column wrapper (the VectorFunctions idiom). */
  def dhash(payload: Column): Column =
    GraftColumnBridge.column(DHash64(GraftColumnBridge.expression(payload)))

  /** Quantized DCT-II cosine table for [[phash64]]: CosQ(u)(i) =
    * round(cos(π·(2i+1)·u/64) · 2^14), u = 0..7 (the low-frequency
    * block), i = 0..31 (the 32-cell grid axis). Computed ONCE here
    * with StrictMath and interpolated as INTEGER LITERALS into the
    * DuckDB oracle SQL (MultimodalQueries) — both engines run the
    * identical integer lattice, so the hash is bit-exact cross-engine
    * with no floating-point trust anywhere.
    */
  val CosQ: Array[Array[Long]] = Array.tabulate(8, 32) { (u, i) =>
    math.round(StrictMath.cos(math.Pi * (2 * i + 1) * u / 64.0) * 16384.0)
  }

  /** 64-bit pHash (perceptual hash — public algorithm: pHash.org;
    * Zauner 2010 "Implementation and benchmarking of perceptual image
    * hash functions"), integer-DCT form: resample the payload to a
    * 32x32 grid (the dhash64 nearest-neighbor index resample),
    * separable 2D DCT-II on the [[CosQ]] quantized-cosine lattice,
    * keep the low-frequency 8x8 block, drop DC, and emit one bit per
    * AC coefficient above the (lower-)median of the 63. Bit k =
    * (u*8 + v − 1), so the hash occupies bits 0..62 — always
    * NONNEGATIVE, which keeps the oracle's bit reassembly trivial.
    *
    * Magnitudes: pixel ≤ 255, |cq| ≤ 2^14, so the row pass is
    * ≤ 255·2^14·32 < 2^37 and the column pass ≤ 2^37·2^14·32 < 2^56 —
    * Long-exact with headroom. Empty payload → 0.
    *
    * Why beside dHash: dHash compares neighboring pixels, so it is
    * EXACTLY invariant under monotone intensity remaps but brittle to
    * per-pixel dither (alternating noise flips near-tie gradients);
    * pHash thresholds low-frequency energy, so dither averages out.
    * The q_multimodal_phash_ab row MEASURES that complement on the
    * stub's transform families rather than assuming it.
    */
  def phash64(payload: Array[Byte]): Long = {
    val len = payload.length
    if (len == 0) return 0L
    // 32x32 resample (LONG index arithmetic — the dhash64 lesson)
    val px = new Array[Long](1024)
    var k = 0
    while (k < 1024) {
      px(k) = payload(((k.toLong * len) / 1024).toInt) & 0xff; k += 1
    }
    // row pass: t(i)(v) = Σ_j px(i,j) · cq(v,j)
    val t = new Array[Long](32 * 8)
    var i = 0
    while (i < 32) {
      var v = 0
      while (v < 8) {
        var s = 0L
        var j = 0
        while (j < 32) { s += px(i * 32 + j) * CosQ(v)(j); j += 1 }
        t(i * 8 + v) = s; v += 1
      }
      i += 1
    }
    // column pass: C(u)(v) = Σ_i cq(u,i) · t(i)(v)
    val c = new Array[Long](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0L
        var ii = 0
        while (ii < 32) { s += CosQ(u)(ii) * t(ii * 8 + v); ii += 1 }
        c(u * 8 + v) = s; v += 1
      }
      u += 1
    }
    // lower median of the 63 AC coefficients (deterministic, no floats)
    val ac = new Array[Long](63)
    System.arraycopy(c, 1, ac, 0, 63)
    java.util.Arrays.sort(ac)
    val med = ac(31)
    var h = 0L
    var b = 1
    while (b < 64) {
      if (c(b) > med) h |= 1L << (b - 1)
      b += 1
    }
    h
  }

  /** Column wrapper (the VectorFunctions idiom). */
  def phash(payload: Column): Column =
    GraftColumnBridge.column(PHash64(GraftColumnBridge.expression(payload)))
}

/** dHash as a native codegen expression: BinaryType → LongType, one
  * fused pass per row inside whole-stage codegen — no UDF boundary, no
  * shuffle; the hash is the ONLY thing that leaves the scan, so media
  * near-dup cost is independent of payload size downstream.
  */
case class DHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "dhash64"

  override def nullSafeEval(in: Any): Any =
    MediaHash.dhash64(in.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MediaHash.dhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): DHash64 =
    copy(child = newChild)
}

/** pHash as a native codegen expression (the [[DHash64]] shape):
  * BinaryType → LongType, one fused pass per row inside whole-stage
  * codegen — the 8-byte hash is the only thing that leaves the scan.
  */
case class PHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "phash64"

  override def nullSafeEval(in: Any): Any =
    MediaHash.phash64(in.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MediaHash.phash64($c)")

  override protected def withNewChildInternal(newChild: Expression): PHash64 =
    copy(child = newChild)
}
