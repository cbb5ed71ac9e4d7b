package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed PCA over an embedding column — the whitening/rotation
  * step in front of PQ codebook training and SemDeDup-style clustering
  * (PQ splits dimensions into subspaces, so correlated dims waste
  * codebook capacity; OPQ-lite = rotate by the principal axes first).
  *
  * Split of labor at 100 TB: the D×D second-moment matrix is the ONLY
  * corpus-sized computation — one mapPartitions pass accumulating
  * quantized integer sums per partition (D·(D+1)/2 upper-triangle
  * longs + D mean longs), reduced on the driver. This is the genuine
  * per-partition-imperative case (MLlib's treeAggregate shape): an
  * explode into (i,j) rows would blow the corpus up D²×, and there is
  * no built-in element-wise array-sum aggregate. Eigensolve then runs
  * on the driver's D×D matrix (power iteration + deflation —
  * microseconds at D=64), and projection back onto the corpus is a
  * map-only column expression.
  *
  * Reproducibility: per-row contributions are floor-quantized to
  * integer units and summed in exact long arithmetic, so the
  * covariance — and every eigenvector derived from it — is identical
  * for ANY partitioning or row order (the QualityClassifier
  * discipline). EmbeddingPcaSpec asserts bitwise equality against an
  * in-memory reference.
  */
object EmbeddingPca {

  val MeanQuant = 1e6
  val ProdQuant = 1e9

  /** One-pass quantized (mean, covariance) of a FLOAT[] embedding
    * column. Returns (n, mean[D], cov[D][D]).
    */
  def covariance(embs: DataFrame, embCol: String): (Long, Array[Double], Array[Array[Double]]) = {
    val spark = embs.sparkSession
    import spark.implicits._
    val parts = embs.select(col(embCol)).as[Array[Float]]
      .mapPartitions { it =>
        var d = -1
        var s1: Array[Long] = null
        var s2: Array[Long] = null // upper triangle, row-major
        var n = 0L
        it.foreach { v =>
          if (d < 0) {
            d = v.length
            s1 = new Array[Long](d)
            s2 = new Array[Long](d * (d + 1) / 2)
          }
          require(v.length == d, s"ragged embedding: ${v.length} vs $d")
          n += 1
          var i = 0
          var t = 0
          while (i < d) {
            val xi = v(i).toDouble
            s1(i) += math.floor(xi * MeanQuant).toLong
            var j = i
            while (j < d) {
              s2(t) += math.floor(xi * v(j).toDouble * ProdQuant).toLong
              j += 1; t += 1
            }
            i += 1
          }
        }
        if (d < 0) Iterator.empty
        else Iterator((n, s1, s2))
      }.collect()
    require(parts.nonEmpty, "empty embedding frame")
    val d = parts.head._2.length
    // The per-row ragged check above is partition-local; two internally
    // consistent partitions with different widths would otherwise merge
    // into a silently truncated (or AIOOBE-crashing) covariance here.
    parts.foreach { case (_, p1, _) =>
      require(p1.length == d,
        s"ragged embedding across partitions: ${p1.length} vs $d")
    }
    val n = parts.map(_._1).sum
    val s1 = new Array[Long](d)
    val s2 = new Array[Long](d * (d + 1) / 2)
    parts.foreach { case (_, p1, p2) =>
      var i = 0
      while (i < d) { s1(i) += p1(i); i += 1 }
      var t = 0
      while (t < s2.length) { s2(t) += p2(t); t += 1 }
    }
    val mean = s1.map(_ / MeanQuant / n)
    val cov = Array.ofDim[Double](d, d)
    var i = 0
    var t = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val m2 = s2(t) / ProdQuant / n
        val c = m2 - mean(i) * mean(j)
        cov(i)(j) = c
        cov(j)(i) = c
        j += 1; t += 1
      }
      i += 1
    }
    (n, mean, cov)
  }

  /** Top-k eigenvectors of a small symmetric matrix by power iteration
    * with deflation — driver-side (D×D is tiny by construction).
    * Deterministic: starts from the normalized all-ones vector; sign
    * is fixed so the largest-|coord| entry is positive.
    */
  def topComponents(cov: Array[Array[Double]], k: Int,
                    iters: Int = 200): Array[Array[Double]] = {
    val d = cov.length
    val c = cov.map(_.clone())
    (0 until k).toArray.map { _ =>
      var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
      for (_ <- 0 until iters) {
        val w = new Array[Double](d)
        var i = 0
        while (i < d) {
          var s = 0.0
          var j = 0
          while (j < d) { s += c(i)(j) * v(j); j += 1 }
          w(i) = s
          i += 1
        }
        val norm = math.sqrt(w.map(x => x * x).sum)
        v = if (norm > 0) w.map(_ / norm) else w
      }
      // canonical sign
      val m = v.indices.maxBy(i => math.abs(v(i)))
      if (v(m) < 0) v = v.map(-_)
      // deflate: c -= lambda v v^T, lambda = v^T c v
      val cv = v.indices.map(i => v.indices.map(j => c(i)(j) * v(j)).sum)
      val lambda = v.indices.map(i => v(i) * cv(i)).sum
      for (i <- 0 until d; j <- 0 until d) c(i)(j) -= lambda * v(i) * v(j)
      v
    }
  }

  /** Map-only projection of the embedding column onto the components:
    * an array<double> of k scores, score_c = Σ_i (x_i − μ_i)·w_c,i.
    */
  def projectExpr(embCol: Column, mean: Array[Double],
                  comps: Array[Array[Double]]): Column =
    array(comps.map { w =>
      w.indices.map { i =>
        (element_at(embCol, i + 1).cast(DoubleType) - lit(mean(i))) * lit(w(i))
      }.reduce(_ + _)
    }: _*)
}
