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

  private def intArg(e: Expression): Int =
    e.eval().asInstanceOf[Number].intValue

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (new FunctionIdentifier("quantized_dot"),
        new ExpressionInfo(classOf[QuantizedDot].getName, "quantized_dot"),
        (args: Seq[Expression]) => QuantizedDot(args(0), args(1))),
      // simhash64(words_array[, bits]) — default 32-bit fingerprint
      (new FunctionIdentifier("simhash64"),
        new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
        (args: Seq[Expression]) => SimHash64(args(0),
          if (args.length > 1) intArg(args(1)) else 32)),
      // shingle_hashes(words_array, n) — distinct word-n-gram hash set
      (new FunctionIdentifier("shingle_hashes"),
        new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
        (args: Seq[Expression]) => ShingleHashes(args(0), intArg(args(1)))),
      // minhash_signature(words_array, n) — canonical k=8 family
      (new FunctionIdentifier("minhash_signature"),
        new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
        (args: Seq[Expression]) => MinHashSignature(args(0), intArg(args(1)),
          MinHashK, MinHashA, MinHashB, MinHashP)),
      // winnowed_fingerprints(text) — canonical k=8/w=4 scheme
      (new FunctionIdentifier("winnowed_fingerprints"),
        new ExpressionInfo(classOf[WinnowedFingerprints].getName,
          "winnowed_fingerprints"),
        (args: Seq[Expression]) => WinnowedFingerprints(args(0),
          WinK, WinW, WinB, WinP)))

  def install(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
