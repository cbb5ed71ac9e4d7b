package graft

import scala.util.Random

import graft.functions.BpeFunctions
import graft.operators.{BpeTrainer, BpeVocab}
import graft.operators.BpeTrainer.Merge
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The scalable BPE encode kernel (functions/BpeExpressions) against
  * three independent pins:
  *   1. vocabulary provenance — BpeVocab's frozen literals ARE what
  *      BpeTrainer learns on the sf0.01 corpus (so the committed vocab
  *      cannot drift from the trainer's semantics);
  *   2. an in-memory reference replay (the classic per-word rewrite
  *      loop) over randomized words — pins the imperative kernel;
  *   3. the declarative segmentExpr fold over real docs — pins kernel ≡
  *      Catalyst-fold semantics, the equivalence that lets the oracle's
  *      replace() chain stand in for the kernel.
  * Plus the lossless-tokenization invariant: stripping delimiters
  * recovers the whitespace-normalized text exactly.
  */
class BpeEncoderSpec extends AnyFunSuite with SparkTestBase {

  private val sfDir = "/root/testdata/sf0.01"
  private val smallDir = "/root/testdata/sf0.001"

  /** Independent reference: replay merges over one word. */
  private def refEncodeWord(w: String, merges: Seq[Merge]): Vector[String] = {
    var syms = w.map(_.toString).toVector
    for (m <- merges) {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.size) {
        if (i + 1 < syms.size && syms(i) == m.l && syms(i + 1) == m.r) {
          out += (m.l + m.r); i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.result()
    }
    syms
  }

  private def refRender(text: String, merges: Seq[Merge]): String =
    text.trim.split("\\s+").filter(_.nonEmpty)
      .map(w => refEncodeWord(w, merges).map(t => s"|$t|").mkString)
      .mkString("#")

  test("frozen BpeVocab is exactly what the trainer learns on sf0.01") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val learned = BpeTrainer.trainOnCorpus(docs, "text", BpeVocab.merges.size)
    assert(learned === BpeVocab.merges)
  }

  test("kernel matches the reference replay on randomized words") {
    val rnd = new Random(42)
    val alphabet = "abcdefghijklmnopqrstuvwy"
    val texts = Seq.tabulate(300) { _ =>
      Seq.fill(1 + rnd.nextInt(8))(
        Seq.fill(1 + rnd.nextInt(12))(
          alphabet(rnd.nextInt(alphabet.length))).mkString)
        .mkString(" ")
    } ++ Seq("", "   ", "a", "aaaa", "keykeykey data table")
    import spark.implicits._
    val got = texts.toDF("text")
      .select(BpeFunctions.bpeEncodeDelim(col("text"), BpeVocab.merges)
        .as("enc"))
      .collect().map(_.getString(0))
    val want = texts.map(refRender(_, BpeVocab.merges))
    assert(got.toSeq === want)
  }

  test("kernel equals the declarative segmentExpr fold on real docs") {
    // 12 merges keep the Catalyst fold tree small; the full-vocab path
    // is pinned by the reference-replay test above.
    val merges = BpeVocab.merges.take(12)
    val docs = spark.read.parquet(s"$smallDir/documents.parquet")
    val viaFold = docs.select(col("doc_id"),
      array_join(
        transform(split(trim(col("text")), "\\s+"),
          w => concat_ws("", transform(BpeTrainer.segmentExpr(w, merges),
            t0 => concat(lit("|"), t0, lit("|"))))),
        "#").as("enc"))
    val viaKernel = docs.select(col("doc_id"),
      BpeFunctions.bpeEncodeDelim(col("text"), merges).as("enc"))
    assert(viaFold.except(viaKernel).isEmpty && viaKernel.except(viaFold).isEmpty)
  }

  /** Independent replica of the DuckDB oracle expression
    * (bpeOracleEncExpr): SQL trim (ASCII spaces ONLY — unlike Java's
    * String.trim), `\s+` → '#', wrap each non-# char in pipes, then the
    * merge replace() chain. Pins the kernel's hand-rolled space-only
    * trim and limit(-1) split on edge whitespace the fixture corpus
    * never exercises (leading/trailing tabs and newlines).
    */
  private def duckRender(text: String, merges: Seq[Merge]): String = {
    val t = text.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
    val base = t.replaceAll("\\s+", "#")
      .flatMap(c => if (c == '#') "#" else s"|$c|")
    merges.foldLeft(base) { (acc, m) =>
      acc.replace(s"|${m.l}||${m.r}|", s"|${m.l}${m.r}|")
    }
  }

  test("kernel matches the oracle rendering on edge whitespace") {
    import spark.implicits._
    val merges = BpeVocab.merges
    val texts = Seq("\tcat", "cat\t", "  cat  ", "a \t b", " \t ", "   ",
      "a\nb\n", "\n\nhot dog", "the\tcat sat\n")
    val got = texts.toDF("text")
      .select(BpeFunctions.bpeEncodeDelim(col("text"), merges).as("enc"))
      .as[String].collect().toSeq
    assert(got === texts.map(duckRender(_, merges)))
  }

  test("kernel matches the oracle rendering on randomized whitespace soup") {
    import spark.implicits._
    val rnd = new Random(7)
    val alphabet = "abcdefghijklmnopqrstuvwy"
    val ws = " \t\n\r"
    // words separated by random whitespace runs, with random edge runs —
    // the property form of the edge-case pins above
    val texts = Seq.tabulate(200) { _ =>
      val sep = () => Seq.fill(1 + rnd.nextInt(3))(
        ws(rnd.nextInt(ws.length))).mkString
      val word = () => Seq.fill(1 + rnd.nextInt(6))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      (if (rnd.nextBoolean()) sep() else "") +
        Seq.fill(1 + rnd.nextInt(5))(word()).mkString(sep()) +
        (if (rnd.nextBoolean()) sep() else "")
    }
    val merges = BpeVocab.merges
    val got = texts.toDF("text")
      .select(BpeFunctions.bpeEncodeDelim(col("text"), merges).as("enc"))
      .as[String].collect().toSeq
    assert(got === texts.map(duckRender(_, merges)))
  }

  test("tokenization is lossless: stripping delimiters recovers the text") {
    val docs = spark.read.parquet(s"$smallDir/documents.parquet")
    // translate: '#' -> ' ', '|' -> deleted — the inverse rendering.
    val bad = docs.select(
      translate(BpeFunctions.bpeEncodeDelim(col("text"), BpeVocab.merges),
        "#|", " ").as("rt"),
      regexp_replace(trim(col("text")), "\\s+", " ").as("norm"))
      .where(col("rt") =!= col("norm"))
      .count()
    assert(bad === 0L)
  }
}
