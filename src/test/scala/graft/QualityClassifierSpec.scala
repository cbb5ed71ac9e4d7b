package graft

import graft.operators.QualityClassifier
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reproducible-training claims, each load-bearing:
  * 1. distributed weights == local-reference weights EXACTLY (not
  *    within tolerance) — the quantized gradient is order-free;
  * 2. weights are invariant under repartitioning — the property plain
  *    double sums do NOT have, and the reason the quantization exists;
  * 3. the learned gate actually separates a separable corpus.
  */
class QualityClassifierSpec extends AnyFunSuite with SparkTestBase {

  // Deterministic synthetic corpus: two feature clusters, label =
  // cluster, linearly separable with margin. Hash-derived pseudo-noise
  // (no RNG) keeps the fixture stable forever.
  private def noise(i: Int, salt: Int): Double =
    ((i * 2654435761L + salt * 40503L) % 1000L) / 10000.0
  private val rows: Seq[(Double, Array[Double])] =
    (0 until 400).map { i =>
      val y = i % 2
      val x0 = y * 0.8 + 0.1 + noise(i, 1)
      val x1 = (1 - y) * 0.6 + 0.2 + noise(i, 2)
      (y.toDouble, Array(x0, x1))
    }

  private def df = {
    import spark.implicits._
    rows.map { case (y, x) => (y, x(0), x(1)) }.toDF("label", "f0", "f1")
  }

  test("distributed training equals the local reference bitwise") {
    val dist = QualityClassifier.train(df, Seq("f0", "f1"), "label",
      iters = 25, lr = 0.5)
    val local = QualityClassifier.trainLocal(rows, iters = 25, lr = 0.5)
    assert(dist.toSeq === local.toSeq) // exact doubles, no tolerance
  }

  test("weights are partitioning-invariant (the reproducibility claim)") {
    val a = QualityClassifier.train(df.repartition(13), Seq("f0", "f1"),
      "label", iters = 10, lr = 0.5)
    val b = QualityClassifier.train(df.coalesce(1), Seq("f0", "f1"),
      "label", iters = 10, lr = 0.5)
    assert(a.toSeq === b.toSeq)
  }

  test("learned gate separates the separable corpus") {
    val w = QualityClassifier.train(df, Seq("f0", "f1"), "label",
      iters = 60, lr = 1.0)
    val acc = df.select(col("label"),
      (QualityClassifier.logit(w.toSeq, Seq(col("f0"), col("f1"))) > 0)
        .cast("double").as("pred"))
      .where(col("label") === col("pred")).count() / 400.0
    assert(acc >= 0.95, s"accuracy $acc")
    // direction sanity: f0 votes FOR label 1, f1 against
    assert(w(1) > 0 && w(2) < 0)
  }

  test("logit column arity is validated") {
    intercept[IllegalArgumentException] {
      QualityClassifier.logit(Seq(0.1, 0.2), Seq(col("f0"), col("f1")))
    }
  }
}
