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
