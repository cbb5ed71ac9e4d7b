package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared md5-hashing kernels for the native text expressions.
  *
  * Hash discipline (see graft.queries.TextQueries): every hash derives
  * from md5 hex digits so Spark and the DuckDB oracle agree bit-for-bit —
  * h36 = first 9 hex digits (36 bits), h60 = first 15 hex digits
  * (60 bits), both parsed as nonnegative BIGINT. The methods here are
  * static so whole-stage codegen can call them directly.
  */
object TextHash {
  private val mdLocal: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First 36 bits of md5(s) — CAST(CONCAT('0x',SUBSTRING(md5(s),1,9)) AS BIGINT). */
  private def h36(bytes: Array[Byte]): Long = {
    val d = mdLocal.get().digest(bytes)
    ((d(0) & 0xffL) << 28) | ((d(1) & 0xffL) << 20) | ((d(2) & 0xffL) << 12) |
      ((d(3) & 0xffL) << 4) | ((d(4) & 0xf0L) >>> 4)
  }

  /** First 60 bits of md5(s) — CAST(CONCAT('0x',SUBSTRING(md5(s),1,15)) AS BIGINT). */
  private def h60(bytes: Array[Byte]): Long = {
    val d = mdLocal.get().digest(bytes)
    var acc = 0L
    var i = 0
    while (i < 7) { acc = (acc << 8) | (d(i) & 0xffL); i += 1 }
    (acc << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  /** UTF-8 bytes of words[i..i+n-1] joined by a single space — identical
    * bytes to concat_ws(" ", slice(words, i+1, n)), so md5 matches the
    * string-built shingle. Null elements are SKIPPED, exactly like
    * concat_ws (the internal word splitter never produces them, but the
    * public shingle_hashes/minhash_signature SQL functions accept
    * arbitrary arrays).
    */
  private def shingleBytes(words: ArrayData, i: Int, n: Int): Array[Byte] = {
    var len = 0
    var nonNull = 0
    var j = 0
    while (j < n) {
      if (!words.isNullAt(i + j)) {
        len += words.getUTF8String(i + j).numBytes()
        nonNull += 1
      }
      j += 1
    }
    if (nonNull > 1) len += nonNull - 1
    val out = new Array[Byte](len)
    var pos = 0
    var first = true
    j = 0
    while (j < n) {
      if (!words.isNullAt(i + j)) {
        if (!first) { out(pos) = ' '; pos += 1 }
        first = false
        val w = words.getUTF8String(i + j)
        w.writeToMemory(out, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + pos)
        pos += w.numBytes()
      }
      j += 1
    }
    out
  }

  /** k MinHash values over the word n-grams of `words`, one row, one pass:
    * h0 = h36(shingle), h_i = (a_i*h0 + b_i) mod p, min per i. Min over
    * the n-gram MULTISET equals min over the distinct set, so no dedup
    * pass is needed. Returns null when the doc has fewer than n words
    * (matching explode-of-empty-array semantics upstream).
    *
    * Products stay in 64-bit range: h0 < 2^36, a_i < 2^23 → a_i*h0 < 2^59.
    */
  def minhashSig(words: ArrayData, n: Int, k: Int,
                 a: Array[Long], b: Array[Long], p: Long): ArrayData = {
    val m = words.numElements() - n + 1
    if (m <= 0) return null
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < m) {
      val h0 = h36(shingleBytes(words, i, n))
      var j = 0
      while (j < k) {
        val h = (a(j) * h0 + b(j)) % p
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** DISTINCT 60-bit hashes of the word n-grams of `words`, one row, one
    * pass (sort + dedup — output order is irrelevant set semantics).
    * Equivalent to array_distinct over string shingles followed by h60,
    * modulo md5-prefix collisions (~d²/2^61 — vanishing). Empty when the
    * doc has fewer than n words.
    */
  def shingleHashes(words: ArrayData, n: Int): ArrayData = {
    val m = words.numElements() - n + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) { hs(i) = h60(shingleBytes(words, i, n)); i += 1 }
    java.util.Arrays.sort(hs)
    var out = 1
    i = 1
    while (i < m) {
      if (hs(i) != hs(i - 1)) { hs(out) = hs(i); out += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, out))
  }

  /** Most-frequent word-n-gram count — EXACT string counts (no
    * hashing: a collision could merge two phrases' counts, and the
    * contract is parity with the oracle's string runs), one hash-map
    * pass per row, O(total n-gram bytes). Null elements are SKIPPED
    * inside each window like concat_ws — the [[shingleBytes]]
    * convention: the internal word splitter never produces them, but
    * the public top_ngram_count SQL function accepts arbitrary arrays
    * and must not NPE.
    */
  def topNgramCount(words: ArrayData, n: Int): Long = {
    val m = words.numElements() - n + 1
    if (m <= 0) return 0L
    val counts = new java.util.HashMap[String, Integer]()
    var best = 0
    var i = 0
    while (i < m) {
      val sb = new java.lang.StringBuilder()
      var first = true
      var j = 0
      while (j < n) {
        if (!words.isNullAt(i + j)) {
          if (!first) sb.append(' ')
          first = false
          sb.append(words.getUTF8String(i + j).toString)
        }
        j += 1
      }
      val c = counts.merge(sb.toString, Integer.valueOf(1),
        (a, b) => Integer.valueOf(a.intValue + b.intValue))
      if (c.intValue > best) best = c.intValue
      i += 1
    }
    best.toLong
  }

  /** Winnowed rolling-hash fingerprints (the MOSS scheme: polynomial
    * rolling hash over char k-grams, then the minimum in each window of
    * w consecutive hashes; public algorithm — Schleimer, Wilkerson,
    * Aiken, SIGMOD 2003). One pass per document: the k-gram hash rolls
    * in O(1) per position — h' = ((h - c_out·b^(k-1))·b + c_in) mod p —
    * instead of O(k) recomputation. Characters are Unicode code points
    * (matches DuckDB `unicode(substring(text,i,1))`). Returns sorted
    * DISTINCT fingerprints; empty when the doc has fewer than k chars.
    */
  def winnow(text: UTF8String, k: Int, w: Int, b: Long, p: Long): ArrayData = {
    val cs = text.toString.codePoints().toArray
    val m = cs.length - k + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    var bPow = 1L // b^(k-1) mod p
    var j = 1
    while (j < k) { bPow = (bPow * b) % p; j += 1 }
    val hs = new Array[Long](m)
    var h = 0L
    j = 0
    while (j < k) { h = (h * b + cs(j) % p) % p; j += 1 }
    hs(0) = h
    var i = 1
    while (i < m) {
      h = (((h + p - (cs(i - 1) % p) * bPow % p) % p) * b + cs(i + k - 1) % p) % p
      hs(i) = h
      i += 1
    }
    val nWin = math.max(m - w + 1, 1)
    val fps = new Array[Long](nWin)
    var t = 0
    while (t < nWin) {
      var mn = hs(t)
      var u = t + 1
      val end = math.min(t + w, m)
      while (u < end) { if (hs(u) < mn) mn = hs(u); u += 1 }
      fps(t) = mn
      t += 1
    }
    java.util.Arrays.sort(fps)
    var out = 1
    t = 1
    while (t < nWin) {
      if (fps(t) != fps(t - 1)) { fps(out) = fps(t); out += 1 }
      t += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(fps, out))
  }

  /** SimHash fingerprint over the token multiset, one row, one pass:
    * per bit j of h60(word), count += (bit ? +1 : -1); fingerprint sets
    * bit j where count > 0. A null token counts -1 on every bit,
    * matching CASE WHEN (h>>j)&1=1 THEN 1 ELSE -1 over a null hash.
    */
  def simhash(words: ArrayData, bits: Int): Long = {
    val counts = new Array[Int](bits)
    val m = words.numElements()
    var i = 0
    while (i < m) {
      val h = if (words.isNullAt(i)) 0L
              else h60(words.getUTF8String(i).getBytes)
      val nullWord = words.isNullAt(i)
      var j = 0
      while (j < bits) {
        if (!nullWord && ((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var acc = 0L
    var j = 0
    while (j < bits) {
      if (counts(j) > 0) acc |= 1L << j
      j += 1
    }
    acc
  }
}

/** MinHash signature of a document's word array as a native expression:
  * the whole signature — n-gram shingling, md5 base hash, k linear
  * permutations, running minima — is computed per ROW in one fused pass,
  * so the 100 TB LSH plan needs NO shuffle of a (doc, shingle) table at
  * all (the composed form pays explode → distinct → groupBy, two full
  * shuffles of a table ~n_tokens× the corpus size). Returns null for
  * docs shorter than n words.
  */
case class MinHashSignature(child: Expression, n: Int, k: Int,
                            a: Seq[Long], b: Seq[Long], p: Long)
    extends UnaryExpression with ExpectsInputTypes {
  require(a.length == k && b.length == k, s"need $k permutation constants")

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_signature"

  private lazy val aArr = a.toArray
  private lazy val bArr = b.toArray

  override def nullSafeEval(in: Any): Any =
    TextHash.minhashSig(in.asInstanceOf[ArrayData], n, k, aArr, bArr, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
      val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
      val r = ctx.freshName("sig")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.TextHash.minhashSig($c, $n, $k, $aRef, $bRef, ${p}L);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** Distinct word-n-gram shingle hashes as a native expression — the
  * set-similarity primitive behind the Jaccard join: per row one fused
  * pass (shingling, md5 hash, dedup), so neither a global distinct
  * shuffle nor interpreted per-position HOF lambdas appear in the plan.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(in: Any): Any =
    TextHash.shingleHashes(in.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.shingleHashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** Winnowed rolling-hash document fingerprints as a native expression:
  * per row one O(n) pass (true rolling update, not per-position
  * recomputation), so fingerprinting is map-only at any corpus scale.
  */
case class WinnowedFingerprints(child: Expression, k: Int, w: Int,
                                b: Long, p: Long)
    extends UnaryExpression with ExpectsInputTypes {
  require(k > 0 && w > 0 && b > 1 && p > 1)

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnowed_fingerprints"

  override def nullSafeEval(in: Any): Any =
    TextHash.winnow(in.asInstanceOf[UTF8String], k, w, b, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHash.winnow($c, $k, $w, ${b}L, ${p}L)")

  override protected def withNewChildInternal(newChild: Expression): WinnowedFingerprints =
    copy(child = newChild)
}

/** SimHash fingerprint of a document's word array as a native expression:
  * per-row single pass, no token explode and no 32-column aggregate — the
  * fingerprint table is produced map-only at any scale.
  */
case class SimHash64(child: Expression, bits: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(bits > 0 && bits <= 63, "bits must fit a signed long")

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(in: Any): Any =
    TextHash.simhash(in.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.simhash($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Most-frequent word-n-gram count as a native expression — the
  * phrase-domination repetition primitive (q_text_top_ngram_mass). One
  * hash-map pass per row; the composed form (build n-gram strings,
  * sort the array, run-length fold through interpreted HOF lambdas)
  * measured ~7x slower at sf0.1. EXACT counts over the n-gram strings
  * — no hashing — so the DuckDB sorted-run oracle matches bit-for-bit.
  */
case class TopNgramCount(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "top_ngram_count"

  override def nullSafeEval(in: Any): Any =
    TextHash.topNgramCount(in.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.topNgramCount($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): TopNgramCount =
    copy(child = newChild)
}

/** Canonical parameter sets shared by the query packs and the SQL
  * function registration (graft.functions.GraftExtensions): one md5
  * base hash + k linear permutations mod the Mersenne prime, and the
  * winnowing scheme constants.
  */
object TextHashDefaults {
  val MinHashK = 8
  val MinHashP = 2147483647L
  val MinHashA: Seq[Long] = Seq(1000003L, 2000003L, 3000017L, 4000037L,
    5000011L, 6000011L, 7000003L, 8000009L)
  val MinHashB: Seq[Long] = Seq(12345L, 54321L, 192837L, 918273L,
    111111L, 222222L, 333333L, 444444L)
  val WinK = 8
  val WinW = 4
  val WinB = 31L
  val WinP = 1048573L
}

/** Column-API wrappers for the native text-hash expressions. */
object TextHashFunctions {
  def minhashSignature(words: Column, n: Int, k: Int,
                       a: Seq[Long], b: Seq[Long], p: Long): Column =
    GraftColumnBridge.column(
      MinHashSignature(GraftColumnBridge.expression(words), n, k, a, b, p))

  def simhash64(words: Column, bits: Int): Column =
    GraftColumnBridge.column(SimHash64(GraftColumnBridge.expression(words), bits))

  def shingleHashes(words: Column, n: Int): Column =
    GraftColumnBridge.column(ShingleHashes(GraftColumnBridge.expression(words), n))

  def winnowedFingerprints(text: Column, k: Int, w: Int, b: Long, p: Long): Column =
    GraftColumnBridge.column(
      WinnowedFingerprints(GraftColumnBridge.expression(text), k, w, b, p))

  def topNgramCount(words: Column, n: Int): Column =
    GraftColumnBridge.column(
      TopNgramCount(GraftColumnBridge.expression(words), n))
}
