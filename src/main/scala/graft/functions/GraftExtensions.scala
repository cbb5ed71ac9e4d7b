package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions installer: exposes the engine's native
  * expressions to SQL. Activate at session build with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * or `.withExtensions(new GraftExtensions)`; for an already-running
  * session use `GraftExtensions.install(spark)` (extensions are only
  * consumed at session construction). Either way,
  * `SELECT quantized_dot(a, b)` then resolves like a built-in.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  import TextHashDefaults._

  /** Arity gate for a SQL builder — a wrong-arg-count call must fail
    * analysis with the usage string, not IndexOutOfBoundsException.
    */
  private def arity(name: String, usage: String, args: Seq[Expression],
                    min: Int, max: Int): Unit =
    if (args.length < min || args.length > max)
      throw new IllegalArgumentException(
        s"$name takes ${if (min == max) s"$min" else s"$min to $max"} " +
          s"argument(s), got ${args.length}; usage: $usage")

  /** Constant integer parameter: must be foldable (a non-literal would
    * be eval'd against no input row) and integral.
    */
  private def intArg(name: String, usage: String, e: Expression): Int = {
    if (!e.foldable)
      throw new IllegalArgumentException(
        s"$name: the parameter must be a constant; usage: $usage")
    e.eval() match {
      case n: Number => n.intValue
      case other => throw new IllegalArgumentException(
        s"$name: the parameter must be an integer, got $other; usage: $usage")
    }
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (new FunctionIdentifier("quantized_dot"),
        new ExpressionInfo(classOf[QuantizedDot].getName, "quantized_dot"),
        (args: Seq[Expression]) => {
          arity("quantized_dot", "quantized_dot(vec_a, vec_b)", args, 2, 2)
          QuantizedDot(args(0), args(1))
        }),
      (new FunctionIdentifier("quantized_l2"),
        new ExpressionInfo(classOf[QuantizedL2].getName, "quantized_l2"),
        (args: Seq[Expression]) => {
          arity("quantized_l2", "quantized_l2(qvec_a, qvec_b)", args, 2, 2)
          QuantizedL2(args(0), args(1))
        }),
      // simhash64(words_array[, bits]) — default 32-bit fingerprint
      (new FunctionIdentifier("simhash64"),
        new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
        (args: Seq[Expression]) => {
          val usage = "simhash64(words_array[, bits])"
          arity("simhash64", usage, args, 1, 2)
          SimHash64(args(0),
            if (args.length > 1) intArg("simhash64", usage, args(1)) else 32)
        }),
      // shingle_hashes(words_array, n) — distinct word-n-gram hash set
      (new FunctionIdentifier("shingle_hashes"),
        new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
        (args: Seq[Expression]) => {
          val usage = "shingle_hashes(words_array, n)"
          arity("shingle_hashes", usage, args, 2, 2)
          ShingleHashes(args(0), intArg("shingle_hashes", usage, args(1)))
        }),
      // minhash_signature(words_array, n) — canonical k=8 family
      (new FunctionIdentifier("minhash_signature"),
        new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
        (args: Seq[Expression]) => {
          val usage = "minhash_signature(words_array, n)"
          arity("minhash_signature", usage, args, 2, 2)
          MinHashSignature(args(0), intArg("minhash_signature", usage, args(1)),
            MinHashK, MinHashA, MinHashB, MinHashP)
        }),
      // hyperplane_sketch(vec, bits, dim) — md5-derived ±1 planes
      (new FunctionIdentifier("hyperplane_sketch"),
        new ExpressionInfo(classOf[HyperplaneSketch].getName, "hyperplane_sketch"),
        (args: Seq[Expression]) => {
          val usage = "hyperplane_sketch(vec, bits, dim)"
          arity("hyperplane_sketch", usage, args, 3, 3)
          HyperplaneSketch(args(0), HyperplaneSketch.md5Signs(
            intArg("hyperplane_sketch", usage, args(1)),
            intArg("hyperplane_sketch", usage, args(2))))
        }),
      // winnowed_fingerprints(text) — canonical k=8/w=4 scheme
      (new FunctionIdentifier("winnowed_fingerprints"),
        new ExpressionInfo(classOf[WinnowedFingerprints].getName,
          "winnowed_fingerprints"),
        (args: Seq[Expression]) => {
          arity("winnowed_fingerprints", "winnowed_fingerprints(text)", args, 1, 1)
          WinnowedFingerprints(args(0), WinK, WinW, WinB, WinP)
        }),
      // top_ngram_count(words_array, n) — most frequent n-gram's count
      (new FunctionIdentifier("top_ngram_count"),
        new ExpressionInfo(classOf[TopNgramCount].getName, "top_ngram_count"),
        (args: Seq[Expression]) => {
          val usage = "top_ngram_count(words_array, n)"
          arity("top_ngram_count", usage, args, 2, 2)
          TopNgramCount(args(0), intArg("top_ngram_count", usage, args(1)))
        }),
      // damerau_levenshtein(a, b) — unrestricted DL distance, DuckDB-
      // compatible byte semantics (graft.functions.StringDistance)
      (new FunctionIdentifier("damerau_levenshtein"),
        new ExpressionInfo(classOf[DamerauLevenshtein].getName,
          "damerau_levenshtein"),
        (args: Seq[Expression]) => {
          arity("damerau_levenshtein", "damerau_levenshtein(a, b)", args, 2, 2)
          DamerauLevenshtein(args(0), args(1))
        }),
      // dhash64(payload) — perceptual difference hash over a binary
      // media payload (graft.functions.MediaHash)
      (new FunctionIdentifier("dhash64"),
        new ExpressionInfo(classOf[DHash64].getName, "dhash64"),
        (args: Seq[Expression]) => {
          arity("dhash64", "dhash64(payload)", args, 1, 1)
          DHash64(args(0))
        }),
      // phash64(payload) — integer-DCT perceptual hash, the published
      // complement to dhash64 (graft.functions.MediaHash)
      (new FunctionIdentifier("phash64"),
        new ExpressionInfo(classOf[PHash64].getName, "phash64"),
        (args: Seq[Expression]) => {
          arity("phash64", "phash64(payload)", args, 1, 1)
          PHash64(args(0))
        }))

  def install(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
