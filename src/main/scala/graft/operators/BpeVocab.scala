package graft.operators

import graft.operators.BpeTrainer.Merge

/** The committed production tokenizer vocabulary: 64 BPE merges trained
  * ONCE on the sf0.01 `documents` corpus by [[BpeTrainer.trainOnCorpus]]
  * and frozen here as literals — the standard LLM-pipeline shape (a
  * tokenizer is trained offline on a sample, then applied unchanged to
  * the full 100 TB corpus; retraining per batch would change token ids
  * under the model). BpeEncoderSpec re-trains on the same corpus and
  * asserts equality with this list, so the literals cannot drift from
  * the trainer's semantics.
  *
  * The DuckDB oracle for the encode queries replays these SAME merges as
  * a chain of `replace('|l||r|','|lr|')` calls over a delimited
  * rendering, which is exactly the trainer's greedy left-to-right
  * non-overlapping rewrite (both are single forward scans that never
  * rematch inside a replacement), so Spark kernel and oracle agree
  * bit-for-bit by construction.
  */
object BpeVocab {
  val merges: Seq[Merge] = Seq(
    Merge("e", "r"), Merge("i", "n"), Merge("o", "w"), Merge("o", "r"),
    Merge("s", "t"), Merge("m", "er"), Merge("a", "t"), Merge("l", "u"),
    Merge("a", "r"), Merge("p", "ar"), Merge("j", "o"), Merge("jo", "in"),
    Merge("a", "s"), Merge("as", "h"), Merge("h", "ash"), Merge("r", "ow"),
    Merge("at", "c"), Merge("atc", "h"), Merge("b", "atch"), Merge("a", "n"),
    Merge("c", "an"), Merge("s", "can"), Merge("c", "o"), Merge("c", "u"),
    Merge("co", "lu"), Merge("colu", "m"), Merge("colum", "n"),
    Merge("cu", "st"), Merge("cust", "o"), Merge("custo", "mer"),
    Merge("f", "i"), Merge("fi", "l"), Merge("fil", "t"), Merge("filt", "er"),
    Merge("a", "l"), Merge("al", "l"), Merge("m", "all"), Merge("s", "mall"),
    Merge("g", "e"), Merge("l", "ow"), Merge("mer", "ge"), Merge("s", "low"),
    Merge("c", "t"), Merge("ct", "or"), Merge("d", "er"), Merge("e", "ctor"),
    Merge("or", "der"), Merge("v", "ector"), Merge("in", "e"),
    Merge("l", "ine"), Merge("a", "b"), Merge("ab", "l"), Merge("abl", "e"),
    Merge("at", "a"), Merge("d", "ata"), Merge("t", "able"), Merge("u", "p"),
    Merge("a", "g"), Merge("ag", "g"), Merge("a", "lu"), Merge("alu", "e"),
    Merge("v", "alue"), Merge("e", "y"), Merge("k", "ey"))
}
