package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed logistic-regression training for corpus quality
  * filtering — the fastText/CCNet-style "train a classifier, gate the
  * corpus" operator (CCNet trains a linear model over page features;
  * LLaMA's pipeline gates CommonCrawl with exactly this shape).
  *
  * The distinguishing property here is BITWISE-REPRODUCIBLE training:
  * a plain `sum(double)` gradient is summation-order-dependent, so two
  * runs of the same job on different partitionings learn (slightly)
  * different weights — poison for the audit/rerun discipline this
  * warehouse guarantees everywhere else (S8 idempotency, deterministic
  * md5 coins). Instead each row's per-feature gradient contribution is
  * floor-quantized to integer NANO-units and summed in exact long
  * arithmetic — order-free — and the weight update divides ONCE per
  * feature per round. Same partitioning-independence trick as
  * q_text_entropy/q_sample_temperature, applied to model training.
  *
  * Scale: one aggregate per round over the feature frame (map-side
  * combined to d+1 longs per partition); the driver holds only the
  * weight vector. Rounds are full passes — batch GD, the right shape
  * when "features" is a narrow projected frame of a huge corpus and
  * d is small (quality signals, not embeddings).
  */
object QualityClassifier {

  /** Overflow headroom: |contribution| * Quant must stay far below
    * 2^63 / rows. Features are expected normalized to O(1); errors are
    * in (-1, 1); Quant 1e9 leaves ~9e9 rows of headroom per feature.
    */
  val Quant = 1e9

  private def sigmoid(z: Double): Double = 1.0 / (1.0 + math.exp(-z))

  /** Squashing link for the GD error term. `Logistic` is the classic
    * sigmoid; `FastSigmoid` (0.5 + z / (2·(1+|z|))) is RATIONAL — no
    * transcendentals — so a training loop using it is IEEE-identical
    * in any engine that implements +,-,*,/,abs correctly, which is
    * what lets q_text_quality_classifier hash-compare a full training
    * run against the DuckDB oracle. Both are smooth, monotone,
    * (0,1)-ranged; logistic regression theory only needs that.
    */
  sealed trait Link {
    def column(z: Column): Column
    def local(z: Double): Double
  }
  case object Logistic extends Link {
    def column(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))
    def local(z: Double): Double = sigmoid(z)
  }
  case object FastSigmoid extends Link {
    def column(z: Column): Column =
      lit(0.5) + z / (lit(2.0) * (lit(1.0) + abs(z)))
    def local(z: Double): Double = 0.5 + z / (2.0 * (1.0 + math.abs(z)))
  }

  /** Train `iters` rounds of batch gradient descent on logistic loss.
    *
    * @param data     frame holding the features and a 0/1 label
    * @param features feature column names (doubles, O(1)-normalized,
    *                 non-null); an intercept is always prepended
    * @param label    0/1 label column name
    * @param iters    gradient rounds (each = one pass over `data`)
    * @param lr       learning rate
    * @return weights, index 0 = intercept, then one per feature
    */
  def train(data: DataFrame, features: Seq[String], label: String,
            iters: Int, lr: Double, link: Link = Logistic): Array[Double] = {
    require(features.nonEmpty, "need at least one feature column")
    // persist: re-read every round; narrow projection of the corpus
    val cols = (label +: features).map(col(_).cast(DoubleType))
    val frame = data.select(cols: _*).persist()
    try {
      val n = frame.count().toDouble
      require(n > 0, "empty training frame")
      val d = features.size
      val w = Array.fill(d + 1)(0.0)
      for (_ <- 0 until iters) {
        // err = sigmoid(w·x) - y, per row; gradient_j = sum(err * x_j)
        // quantized per row THEN summed: exact, order-free longs
        val z = features.zipWithIndex.map { case (f, j) =>
          col(f).cast(DoubleType) * lit(w(j + 1))
        }.foldLeft(lit(w(0)))(_ + _)
        val err = link.column(z) - col(label).cast(DoubleType)
        def q(c: Column): Column = floor(c * lit(Quant)).cast(LongType)
        val sums = frame.agg(
          sum(q(err)).as("g0"),
          features.zipWithIndex.map { case (f, j) =>
            sum(q(err * col(f).cast(DoubleType))).as(s"g${j + 1}")
          }: _*).head()
        for (j <- 0 to d)
          w(j) -= lr * (sums.getLong(j) / Quant) / n
      }
      w
    } finally { frame.unpersist(); () }
  }

  /** Reference single-machine trainer with the IDENTICAL quantization —
    * used by QualityClassifierSpec to prove the distributed aggregate
    * computes the exact same weights (== on doubles, not tolerance).
    */
  def trainLocal(rows: Seq[(Double, Array[Double])],
                 iters: Int, lr: Double,
                 link: Link = Logistic): Array[Double] = {
    require(rows.nonEmpty, "empty training set")
    val d = rows.head._2.length
    val n = rows.size.toDouble
    val w = Array.fill(d + 1)(0.0)
    for (_ <- 0 until iters) {
      val g = Array.fill(d + 1)(0L)
      for ((y, x) <- rows) {
        // left-fold from the intercept — the same association as the
        // distributed column expression, so the doubles match bitwise
        var z = w(0)
        for (j <- x.indices) z += x(j) * w(j + 1)
        val err = link.local(z) - y
        g(0) += math.floor(err * Quant).toLong
        for (j <- 0 until d)
          g(j + 1) += math.floor(err * x(j) * Quant).toLong
      }
      for (j <- 0 to d) w(j) -= lr * (g(j) / Quant) / n
    }
    w
  }

  /** Map-only scoring column: the LOGIT w·x (not the sigmoid — the
    * logit is polynomial in the features, so it hash-compares across
    * engines; prob > 0.5 ⇔ logit > 0 for gating).
    */
  def logit(weights: Seq[Double], features: Seq[Column]): Column = {
    require(weights.size == features.size + 1,
      s"${weights.size} weights for ${features.size} features + intercept")
    features.zip(weights.tail).map { case (f, wj) =>
      f.cast(DoubleType) * lit(wj)
    }.foldLeft(lit(weights.head))(_ + _)
  }
}
