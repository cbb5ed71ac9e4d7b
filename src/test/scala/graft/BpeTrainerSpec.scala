package graft

import graft.operators.BpeTrainer
import graft.operators.BpeTrainer.Merge
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BpeTrainer vs an independent in-memory reference implementation:
  * the distributed trainer must learn the SAME merge sequence (same
  * pairs, same order, deterministic tie-breaks) and segment words
  * identically. The reference is written the classic way (mutable
  * pair-count dict over a word list) so a shared bug is unlikely.
  */
class BpeTrainerSpec extends AnyFunSuite with SparkTestBase {

  /** Reference BPE: classic dict-of-pairs implementation. */
  private def refTrain(words: Seq[(String, Long)],
                       numMerges: Int): Seq[Merge] = {
    var vocab: Seq[(Vector[String], Long)] =
      words.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val merges = Seq.newBuilder[Merge]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val counts = collection.mutable.Map[(String, String), Long]()
      for ((syms, f) <- vocab; i <- 0 until syms.size - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      if (counts.isEmpty) done = true
      else {
        val ((l, r), _) = counts.toSeq
          .sortBy { case ((l, r), n) => (-n, l, r) }.head
        merges += Merge(l, r)
        vocab = vocab.map { case (syms, f) => (refApply(syms, l, r), f) }
        round += 1
      }
    }
    merges.result()
  }

  /** Reference left-to-right greedy non-overlapping rewrite. */
  private def refApply(syms: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.size) {
      if (i + 1 < syms.size && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private val corpus = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L),
    ("low", 0L), // zero-frequency row must not influence counts
    ("aaa", 4L), // overlap case: (a,a) merges non-overlapping
    ("banana", 7L), ("bandana", 2L), ("a", 9L)) // 1-char word: no pairs

  private def wordFreq = {
    import spark.implicits._
    corpus.toDF("word", "freq")
  }

  test("learned merge sequence matches the reference exactly") {
    val got = BpeTrainer.train(wordFreq, numMerges = 12)
    val want = refTrain(corpus, numMerges = 12)
    assert(got === want)
    assert(got.size === 12) // corpus is rich enough to fill all rounds
  }

  test("segmentation by replayed merges matches the reference") {
    val merges = refTrain(corpus, numMerges = 8)
    var ref = corpus.map { case (w, _) => w.map(_.toString).toVector }
    for (m <- merges) ref = ref.map(refApply(_, m.l, m.r))
    import spark.implicits._
    val got = corpus.map(_._1).toDF("word")
      .select(BpeTrainer.segmentExpr(col("word"), merges).as("syms"))
      .collect().map(_.getSeq[String](0).toVector).toSeq
    assert(got === ref)
  }

  test("greedy non-overlapping rewrite: aaa + (a,a) -> [aa, a]") {
    import spark.implicits._
    val got = Seq("aaa", "aaaa", "aab").toDF("word")
      .select(BpeTrainer.applyMerge(
        BpeTrainer.initSymbols(col("word")), Merge("a", "a")).as("syms"))
      .collect().map(_.getSeq[String](0).toList).toList
    assert(got === List(List("aa", "a"), List("aa", "aa"), List("aa", "b")))
  }

  test("stops early when no pairs remain and on minCount") {
    import spark.implicits._
    val single = Seq(("a", 5L), ("b", 3L)).toDF("word", "freq")
    assert(BpeTrainer.train(single, numMerges = 4) === Seq.empty)
    // ab freq 2 < minCount 3 -> nothing learned
    val rare = Seq(("ab", 2L)).toDF("word", "freq")
    assert(BpeTrainer.train(rare, numMerges = 4, minCount = 3L) === Seq.empty)
    assert(BpeTrainer.train(rare, numMerges = 4, minCount = 2L) ===
      Seq(Merge("a", "b")))
  }

  test("trainOnCorpus agrees with reference over exploded corpus words") {
    import spark.implicits._
    val docs = Seq("the cat sat", "the cat ran", "that hat").toDF("text")
    val words = Seq("the", "cat", "sat", "the", "cat", "ran", "that", "hat")
      .groupBy(identity).map { case (w, ws) => (w, ws.size.toLong) }.toSeq
    assert(BpeTrainer.trainOnCorpus(docs, "text", 6) === refTrain(words, 6))
  }
}
