package graft

import graft.functions.TextHashFunctions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.security.MessageDigest
import scala.util.Random

/** Model-based property tests for the native text-hash kernels: random
  * documents (including multi-byte unicode words, empty strings, and
  * pathological whitespace) are hashed by the expressions and compared
  * against a pure-Scala model of the md5-prefix semantics the DuckDB
  * oracle computes. This pins the manual UTF-8 shingle concatenation and
  * the 36/60-bit hex-prefix extraction against reference arithmetic.
  */
class TextHashPropertiesSpec extends AnyFunSuite with SparkTestBase {

  private val rnd = new Random(1234)

  private val vocab = Seq("the", "cat", "naïve", "héllo", "日本語", "Ω",
    "x", "longerword", "Straße", "emoji😀mid", "0042", "mixedCase")

  private def randomDoc(): String =
    (0 until rnd.nextInt(12)).map(_ => vocab(rnd.nextInt(vocab.size)))
      .mkString(" ")

  // --- pure-Scala model of the oracle arithmetic ---
  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def hexPrefix(s: String, digits: Int): Long =
    java.lang.Long.parseLong(md5hex(s).take(digits), 16)

  private def modelWords(text: String): Seq[String] =
    text.trim.split("\\s+", -1).toSeq

  private def modelShingles(text: String, n: Int): Seq[String] = {
    val w = modelWords(text)
    if (w.length < n) Seq.empty else w.sliding(n).map(_.mkString(" ")).toSeq
  }

  private def modelMinhash(text: String, k: Int, a: Seq[Long], b: Seq[Long],
                           p: Long): Option[Seq[Long]] = {
    val sh = modelShingles(text, 3)
    if (sh.isEmpty) None
    else Some((0 until k).map { i =>
      sh.map(s => (a(i) * hexPrefix(s, 9) + b(i)) % p).min
    })
  }

  private def modelSimhash(text: String, bits: Int): Long = {
    val counts = new Array[Int](bits)
    modelWords(text).foreach { w =>
      val h = hexPrefix(w, 15)
      (0 until bits).foreach { j =>
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
      }
    }
    (0 until bits).map(j => if (counts(j) > 0) 1L << j else 0L).sum
  }

  private def modelShingleHashes(text: String, n: Int): Seq[Long] =
    modelShingles(text, n).map(s => hexPrefix(s, 15)).distinct.sorted

  private def modelWinnow(text: String, k: Int, w: Int, b: Long, p: Long): Seq[Long] = {
    val cs = text.codePoints().toArray
    val m = cs.length - k + 1
    if (m <= 0) return Seq.empty
    // positional (non-rolling) recomputation — what the SQL oracle does
    val hs = (0 until m).map { i =>
      (0 until k).foldLeft(0L)((h, j) => (h * b + cs(i + j) % p) % p)
    }
    (0 until math.max(m - w + 1, 1))
      .map(t => hs.slice(t, math.min(t + w, m)).min)
      .distinct.sorted
  }

  test("winnowed fingerprints: rolling kernel equals positional model") {
    import spark.implicits._
    val docs = (1 to 200).map(i => (i.toLong, randomDoc())) ++
      Seq((901L, ""), (902L, "abcdefg"), (903L, "abcdefgh"), (904L, "aaaaaaaaaaaa"))
    val got = docs.toDF("id", "text")
      .select(col("id"), winnowedFingerprints(col("text"), 8, 4, 31L, 1048573L)
        .as("fps"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toSeq)).toMap
    docs.foreach { case (id, text) =>
      assert(got(id) === modelWinnow(text, 8, 4, 31L, 1048573L), s"doc <$text>")
    }
  }

  test("null-bearing arrays shingle like concat_ws (nulls skipped)") {
    // The SQL-exposed functions accept arbitrary arrays; the kernel must
    // skip nulls exactly like concat_ws — compare against the composed
    // concat_ws + md5 form on random arrays salted with nulls and "".
    import spark.implicits._
    val arrays: Seq[Seq[Option[String]]] = (1 to 150).map { _ =>
      (0 until rnd.nextInt(7)).map { _ =>
        rnd.nextInt(4) match {
          case 0 => None
          case 1 => Some("")
          case _ => Some(vocab(rnd.nextInt(vocab.size)))
        }
      }
    } :+ Seq(None, None, None) :+ Seq(Some(""), None, Some("x"), Some(""))
    val df = arrays.zipWithIndex
      .map { case (a, i) => (i.toLong, a) }.toDF("id", "words")
    val got = df.select(col("id"), shingleHashes(col("words"), 3).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    arrays.zipWithIndex.foreach { case (a, i) =>
      val n = a.length
      val model =
        if (n < 3) Seq.empty
        else (0 to n - 3).map { j =>
          // concat_ws semantics: nulls dropped, empties kept
          hexPrefix(a.slice(j, j + 3).flatten.mkString(" "), 15)
        }.distinct.sorted
      assert(got(i.toLong) === model, s"array $a")
    }
  }

  test("native kernels match the pure-Scala oracle model on 300 random docs") {
    import spark.implicits._
    val (k, p) = (8, 2147483647L)
    val a = Seq(1000003L, 2000003L, 3000017L, 4000037L,
      5000011L, 6000011L, 7000003L, 8000009L)
    val b = Seq(12345L, 54321L, 192837L, 918273L,
      111111L, 222222L, 333333L, 444444L)
    val docs = (1 to 300).map(i => (i.toLong, randomDoc()))
    val w = split(trim(col("text")), "\\s+")
    val got = docs.toDF("id", "text")
      .select(col("id"),
        minhashSignature(w, 3, k, a, b, p).as("mh"),
        simhash64(w, 32).as("sim"),
        shingleHashes(w, 3).as("hs"))
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getSeq[Long](1).toSeq),
        r.getLong(2), r.getSeq[Long](3).toSeq))
      .sortBy(_._1)
    docs.zip(got).foreach { case ((id, text), (gid, mh, sim, hs)) =>
      assert(id === gid)
      assert(mh === modelMinhash(text, k, a, b, p), s"minhash for <$text>")
      assert(sim === modelSimhash(text, 32), s"simhash for <$text>")
      assert(hs === modelShingleHashes(text, 3).sorted, s"shingles for <$text>")
    }
  }
}
