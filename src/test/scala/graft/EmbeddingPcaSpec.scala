package graft

import graft.operators.EmbeddingPca
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EmbeddingPcaSpec extends AnyFunSuite with SparkTestBase {

  // deterministic anisotropic cloud in R^6: dominant variance along a
  // planted direction u, small hash-noise elsewhere — no RNG
  private val d = 6
  private val u = {
    val raw = Array(3.0, 1.0, -2.0, 0.5, 0.0, 1.5)
    val n = math.sqrt(raw.map(x => x * x).sum)
    raw.map(_ / n)
  }
  private def noise(i: Int, j: Int): Double =
    ((i * 2654435761L + j * 97L) % 200L - 100L) / 1000.0
  private val vecs: Seq[Array[Float]] = (0 until 300).map { i =>
    val a = (i % 21 - 10).toDouble // amplitude -10..10 along u
    Array.tabulate(d)(j => (a * u(j) + noise(i, j)).toFloat)
  }

  private def df = {
    import spark.implicits._
    vecs.map(v => Tuple1(v)).toDF("embedding")
  }

  /** In-memory covariance with the identical quantization. */
  private def localCov(): (Long, Array[Double], Array[Array[Double]]) = {
    val n = vecs.size.toLong
    val s1 = new Array[Long](d)
    val s2 = new Array[Long](d * (d + 1) / 2)
    vecs.foreach { v =>
      var i = 0; var t = 0
      while (i < d) {
        val xi = v(i).toDouble
        s1(i) += math.floor(xi * EmbeddingPca.MeanQuant).toLong
        var j = i
        while (j < d) {
          s2(t) += math.floor(xi * v(j).toDouble * EmbeddingPca.ProdQuant).toLong
          j += 1; t += 1
        }
        i += 1
      }
    }
    val mean = s1.map(_ / EmbeddingPca.MeanQuant / n)
    val cov = Array.ofDim[Double](d, d)
    var i = 0; var t = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = s2(t) / EmbeddingPca.ProdQuant / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        j += 1; t += 1
      }
      i += 1
    }
    (n, mean, cov)
  }

  test("distributed covariance equals the local reference bitwise") {
    val (n, mean, cov) = EmbeddingPca.covariance(df.repartition(7), "embedding")
    val (ln, lmean, lcov) = localCov()
    assert(n === ln)
    assert(mean.toSeq === lmean.toSeq) // exact doubles
    assert(cov.map(_.toSeq).toSeq === lcov.map(_.toSeq).toSeq)
  }

  test("covariance is partitioning-invariant") {
    val a = EmbeddingPca.covariance(df.repartition(11), "embedding")
    val b = EmbeddingPca.covariance(df.coalesce(1), "embedding")
    assert(a._2.toSeq === b._2.toSeq)
    assert(a._3.map(_.toSeq).toSeq === b._3.map(_.toSeq).toSeq)
  }

  test("top component recovers the planted direction") {
    val (_, _, cov) = EmbeddingPca.covariance(df, "embedding")
    val comps = EmbeddingPca.topComponents(cov, k = 2)
    val cos = math.abs(comps(0).indices.map(i => comps(0)(i) * u(i)).sum)
    assert(cos > 0.99, s"|cos(pc1, planted)| = $cos")
    // components are orthonormal
    def dot(a: Array[Double], b: Array[Double]) =
      a.indices.map(i => a(i) * b(i)).sum
    assert(math.abs(dot(comps(0), comps(0)) - 1.0) < 1e-9)
    assert(math.abs(dot(comps(0), comps(1))) < 1e-6)
  }

  test("lattice scatter is partitioning-invariant and matches a local replay") {
    val (n, s1, s2) = EmbeddingPca.latticeScatter(df.repartition(7), "embedding")
    val (n2, s12, s22) = EmbeddingPca.latticeScatter(df.coalesce(1), "embedding")
    assert(n === n2 && s1.toSeq === s12.toSeq && s2.toSeq === s22.toSeq)
    // local replay of the identical recipe
    val ls1 = new Array[Long](d)
    val ls2 = new Array[Long](d * (d + 1) / 2)
    vecs.foreach { v =>
      val q = Array.tabulate(d)(i => math.floor(v(i).toDouble * 1000.0).toLong)
      var i = 0; var t = 0
      while (i < d) {
        ls1(i) += q(i)
        var j = i
        while (j < d) { ls2(t) += q(i) * q(j); j += 1; t += 1 }
        i += 1
      }
    }
    assert(n === vecs.size.toLong)
    assert(s1.toSeq === ls1.toSeq)
    assert(s2.toSeq === ls2.toSeq)
  }

  test("integer power iteration recovers the planted direction") {
    val (n, s1, s2) = EmbeddingPca.latticeScatter(df, "embedding")
    val c = EmbeddingPca.latticeScatterMatrix(n, s1, s2)
    val v = EmbeddingPca.latticePowerIter(c, 12)
    val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
    val cos = math.abs(v.indices.map(i => v(i) / norm * u(i)).sum)
    assert(cos > 0.99, s"|cos(lattice pc1, planted)| = $cos")
    // canonical sign: the first max-|v| coordinate is non-negative
    val mx = v.map(math.abs).max
    assert(v(v.indexWhere(x => math.abs(x) == mx)) >= 0)
  }

  test("lattice projection correlates with the planted amplitude") {
    val (n, s1, s2) = EmbeddingPca.latticeScatter(df, "embedding")
    val c = EmbeddingPca.latticeScatterMatrix(n, s1, s2)
    val v = EmbeddingPca.latticePowerIter(c, 12)
    val scores = df
      .select(EmbeddingPca.latticeProjectExpr(col("embedding"), n, s1, v).as("p"))
      .collect().map(_.getLong(0).toDouble)
    val amp = (0 until 300).map(i => (i % 21 - 10).toDouble)
    val ms = scores.sum / scores.length
    val ma = amp.sum / amp.length
    val covSA = scores.indices.map(i => (scores(i) - ms) * (amp(i) - ma)).sum
    val vS = math.sqrt(scores.map(x => (x - ms) * (x - ms)).sum)
    val vA = math.sqrt(amp.map(x => (x - ma) * (x - ma)).sum)
    assert(math.abs(covSA / (vS * vA)) > 0.99)
  }

  test("projection scores carry the planted amplitude ordering") {
    val (_, mean, cov) = EmbeddingPca.covariance(df, "embedding")
    val comps = EmbeddingPca.topComponents(cov, k = 1)
    val scores = df
      .select(EmbeddingPca.projectExpr(col("embedding"), mean, comps).as("p"))
      .collect().map(_.getSeq[Double](0).head)
    // amplitude along u was (i % 21 - 10); projection must correlate
    // almost perfectly (|r| > 0.99) with it
    val amp = (0 until 300).map(i => (i % 21 - 10).toDouble)
    val ms = scores.sum / scores.length
    val ma = amp.sum / amp.length
    val covSA = scores.indices.map(i => (scores(i) - ms) * (amp(i) - ma)).sum
    val vS = math.sqrt(scores.map(x => (x - ms) * (x - ms)).sum)
    val vA = math.sqrt(amp.map(x => (x - ma) * (x - ma)).sum)
    assert(math.abs(covSA / (vS * vA)) > 0.99)
  }
}
