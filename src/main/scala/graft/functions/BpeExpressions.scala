package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.BpeTrainer.Merge

/** Scalable BPE tokenizer APPLICATION — the encode half of the
  * tokenizer story ([[graft.operators.BpeTrainer]] is the train half).
  *
  * Semantics: replay the trained merges in learned order, each as a
  * greedy left-to-right non-overlapping rewrite — identical to
  * [[graft.operators.BpeTrainer.segmentExpr]], but as a per-partition
  * imperative kernel instead of a merges-deep Catalyst fold chain, so a
  * production-sized vocabulary (30k merges) costs a bounded loop per
  * DISTINCT word rather than a 30k-node expression tree per row.
  *
  * Scale design (100 TB): encoding is MAP-ONLY (no shuffle — the merge
  * table rides inside the expression, one copy per executor via the
  * codegen references array, never a join), and each task keeps a
  * per-thread word→encoding cache: word frequency is Zipfian, so the
  * amortized cost per token approaches a hash lookup — the same
  * corpus-collapse observation the trainer exploits. The cache is
  * bounded (64k entries, cleared when full) so a pathological
  * all-distinct-words corpus degrades to compute, never to memory
  * growth.
  *
  * Output rendering: tokens wrapped in `|…|`, words joined by `#`
  * (e.g. "the cat" → "|th||e|#|cat|"). This delimited form is the
  * cross-engine contract: the DuckDB oracle reproduces it with a
  * replace() chain over the same merges, and token counts / stripped
  * text derive from it by pure string ops on both engines. The
  * document charset (letters + whitespace) never collides with the
  * delimiters; a general corpus would escape them in the same
  * normalization pass that strips control characters.
  */
object BpeKernel {

  private val Ws = Pattern.compile("\\s+")

  /** Trained merge table in replay order + the per-thread word cache.
    * Serializable (ships to executors inside the expression); the cache
    * is rebuilt lazily per JVM.
    */
  final class Vocab(merges: Seq[Merge]) extends Serializable {
    val l: Array[String] = merges.map(_.l).toArray
    val r: Array[String] = merges.map(_.r).toArray
    val lr: Array[String] = merges.map(m => m.l + m.r).toArray
    @transient private lazy val cache:
        ThreadLocal[java.util.HashMap[String, String]] =
      ThreadLocal.withInitial(() => new java.util.HashMap[String, String]())

    private[BpeKernel] def cached(w: String): String = {
      val c = cache.get()
      var e = c.get(w)
      if (e == null) {
        e = encodeWord(w, this)
        if (c.size() >= 65536) c.clear()
        c.put(w, e)
      }
      e
    }
  }

  /** Replay all merges over one word; returns the `|t1||t2|…` form. */
  private def encodeWord(w: String, v: Vocab): String = {
    var syms = new Array[String](w.length)
    var n = w.length
    var i = 0
    while (i < n) { syms(i) = String.valueOf(w.charAt(i)); i += 1 }
    var mi = 0
    while (mi < v.l.length) {
      val l = v.l(mi)
      val r = v.r(mi)
      var read = 0
      var write = 0
      while (read < n) {
        if (read + 1 < n && syms(read) == l && syms(read + 1) == r) {
          syms(write) = v.lr(mi)
          read += 2
        } else {
          syms(write) = syms(read)
          read += 1
        }
        write += 1
      }
      n = write
      mi += 1
    }
    val sb = new java.lang.StringBuilder(w.length * 3)
    i = 0
    while (i < n) { sb.append('|').append(syms(i)).append('|'); i += 1 }
    sb.toString
  }

  /** Encode a document: whitespace words (same splitter as the trainer:
    * trim + `\s+`), each encoded and `#`-joined. Static so whole-stage
    * codegen calls it directly.
    *
    * Splitter parity is exact, not approximate: SQL `trim` (Spark and
    * DuckDB both) strips ASCII SPACES ONLY — Java's `String.trim` also
    * eats \t\n\r and would render "\tcat" as "|c||a||t|" while the
    * oracle's trim leaves the tab for the `\s+`→`#` rewrite and emits
    * "#|c||a||t|". Likewise Spark's `split` runs with limit -1 (keeps
    * trailing empty strings), so "cat\t" must render "|c||a||t|#".
    * Hence the hand-rolled space-only trim and `split(s, -1)` below;
    * empty words encode to "" and cost nothing downstream (token count
    * is pipe-pairs, char count strips delimiters).
    */
  def encodeDelim(text: UTF8String, v: Vocab): UTF8String = {
    val raw = text.toString
    var b = 0
    var e = raw.length
    while (b < e && raw.charAt(b) == ' ') b += 1
    while (e > b && raw.charAt(e - 1) == ' ') e -= 1
    val s = raw.substring(b, e)
    if (s.isEmpty) return UTF8String.EMPTY_UTF8
    val ws = Ws.split(s, -1)
    val sb = new java.lang.StringBuilder(s.length * 3)
    var i = 0
    while (i < ws.length) {
      if (i > 0) sb.append('#')
      sb.append(v.cached(ws(i)))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** Delimited BPE encoding of a text column as a native expression —
  * one fused map-only pass per row, inside whole-stage codegen.
  */
case class BpeEncodeDelim(child: Expression, merges: Seq[Merge])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_encode_delim"

  @transient private lazy val vocab = new BpeKernel.Vocab(merges)

  override def nullSafeEval(in: Any): Any =
    BpeKernel.encodeDelim(in.asInstanceOf[UTF8String], vocab)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val vRef = ctx.addReferenceObj("bpeVocab", vocab,
        classOf[BpeKernel.Vocab].getName)
      s"${ev.value} = graft.functions.BpeKernel.encodeDelim($c, $vRef);"
    })

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeDelim =
    copy(child = newChild)
}

object BpeFunctions {
  /** Column form of [[BpeEncodeDelim]]. */
  def bpeEncodeDelim(text: Column, merges: Seq[Merge]): Column =
    GraftColumnBridge.column(
      BpeEncodeDelim(GraftColumnBridge.expression(text), merges))
}
