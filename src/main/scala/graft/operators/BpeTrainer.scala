package graft.operators

import graft.plans.Checkpoints.CutOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed byte-pair-encoding vocabulary training (Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword Units")
  * — the tokenizer-training operator of an LLM data pipeline.
  *
  * Shape: the corpus is collapsed ONCE to its distinct-word frequency
  * table (vocabulary grows ~ Heaps' law, far sublinear in corpus
  * bytes); every training round then works on that table only — one
  * pair-count aggregate (map-side combined to |pair vocabulary| rows)
  * and one map-only rewrite. The driver holds exactly one row per
  * round (the argmax pair via a distributed TakeOrdered head), never
  * the vocabulary. `localCheckpoint` truncates lineage per round, the
  * same discipline as ConnectedComponents.minLabel (use reliable
  * checkpoint on a cluster).
  *
  * Semantics pinned by the q_text_bpe_pairs oracle row (round-1 pair
  * counts) and BpeTrainerSpec (multi-round vs an in-memory reference):
  * symbols start as single characters (no end-of-word marker — merges
  * never cross word boundaries, which the word-keyed table enforces by
  * construction); each round merges THE most frequent adjacent symbol
  * pair, ties broken lexicographically by (left, right); a merge
  * rewrites every word left-to-right greedily over non-overlapping
  * occurrences ("aaa" + merge (a,a) -> [aa, a]).
  */
object BpeTrainer {

  /** One learned merge: adjacent symbols `l`,`r` rewrite to `l+r`. */
  final case class Merge(l: String, r: String)

  /** Single-char symbol array for a word column (ANSI-safe: substr). */
  def initSymbols(word: Column): Column =
    transform(sequence(lit(1), length(word)), i => word.substr(i, lit(1)))

  /** Left-to-right greedy non-overlapping rewrite of one merge over a
    * symbol-array column: fold the array, replacing a trailing `l`
    * followed by the incoming `r` with `l+r`. The fold accumulator is
    * the rewritten prefix, so a symbol produced by THIS merge never
    * re-matches as `l` unless it literally equals it (impossible:
    * `l+r` == `l` needs an empty `r`).
    */
  def applyMerge(syms: Column, m: Merge): Column =
    aggregate(syms, array().cast(ArrayType(StringType)),
      (acc, x) => when(size(acc) > 0 &&
          element_at(acc, -1) === lit(m.l) && x === lit(m.r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(m.l + m.r))))
        .otherwise(concat(acc, array(x))))

  /** Adjacent-pair frequency table (l, r, n) of a symbolized word-freq
    * frame — one aggregate, the only shuffle in a training round.
    */
  def pairCounts(symFreq: DataFrame): DataFrame =
    symFreq.where(size(col("syms")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("syms")) - 1),
        i => struct(element_at(col("syms"), i).as("l"),
          element_at(col("syms"), i + 1).as("r")))).as("p"), col("freq"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("freq")).as("n"))

  /** Train `numMerges` merges over a word-frequency table.
    *
    * @param wordFreq columns `word` (non-null string), `freq` (long)
    * @param numMerges merge rounds to learn
    * @param minCount  stop early when the best pair's weighted count
    *                  falls below this (1 = run until no pairs remain)
    * @return merges in learned order, possibly fewer than `numMerges`
    */
  def train(wordFreq: DataFrame, numMerges: Int,
            minCount: Long = 1L): Seq[Merge] = {
    val chain = graft.plans.Checkpoints.chain() // reliable-policy file GC
    var symFreq = chain.cut(wordFreq
      .select(initSymbols(col("word")).as("syms"), col("freq")))
    val merges = Seq.newBuilder[Merge]
    var done = false
    var round = 0
    while (!done && round < numMerges) {
      // deterministic argmax: max count, then lexicographic (l, r) —
      // a distributed TakeOrderedAndProject; the driver sees ONE row
      val best = pairCounts(symFreq)
        .orderBy(col("n").desc, col("l").asc, col("r").asc)
        .head(1)
      best.headOption match {
        case Some(row) if row.getLong(2) >= minCount =>
          val m = Merge(row.getString(0), row.getString(1))
          merges += m
          symFreq = symFreq
            .select(applyMerge(col("syms"), m).as("syms"), col("freq"))
          // merge rewrites are MAP-ONLY, so the per-round cut was pure
          // materialization overhead: the next round's argmax job
          // replays at most CutStride rewrite layers from the last cut
          // (vocabulary-sized map work) instead of paying a full
          // vocabulary materialization + job barrier every round —
          // the Checkpoints.CutStride trade, halving the actions per
          // learned merge
          round += 1
          if (round % graft.plans.Checkpoints.CutStride == 0)
            symFreq = chain.cut(symFreq)
        case _ => done = true
      }
    }
    // the result is DRIVER-side (the merge list) — no returned frame
    // reads the checkpoints, so every round file is reclaimable now
    chain.reclaimAll()
    merges.result()
  }

  /** Corpus convenience: whitespace words -> frequency table -> train. */
  def trainOnCorpus(docs: DataFrame, textCol: String,
                    numMerges: Int): Seq[Merge] =
    train(docs
      .select(explode(split(trim(col(textCol)), "\\s+")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq")), numMerges)

  /** Segment a word column by replaying the merges in learned order —
    * one fused map-only expression (no shuffle, no UDF). The expression
    * tree grows linearly with the merge count: fine for the moderate
    * vocabularies tested here; a production 30k-merge vocabulary would
    * apply the equivalent trie longest-match in a mapPartitions kernel
    * instead of a 30k-deep fold chain.
    */
  def segmentExpr(word: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(initSymbols(word))((syms, m) => applyMerge(syms, m))
}
