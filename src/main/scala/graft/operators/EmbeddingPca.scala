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
  * corpus-sized computation — one `treeAggregate` pass accumulating
  * quantized integer sums (D·(D+1)/2 upper-triangle longs + D mean
  * longs), merged executor-side in log-depth rounds so the driver
  * receives O(fan-in) triangles, never one per partition. This is the
  * genuine per-partition-imperative case (MLlib's treeAggregate
  * shape): an explode into (i,j) rows would blow the corpus up D²×,
  * and there is no built-in element-wise array-sum aggregate.
  * Eigensolve then runs on the driver's D×D matrix (power iteration +
  * deflation — microseconds at D=64), and projection back onto the
  * corpus is a map-only column expression.
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

  /** Accumulator for the one-pass moment sums: row count, per-dim sums,
    * upper-triangle (row-major) product sums. Width is discovered from
    * the first row (`d < 0` = still empty).
    */
  private type Moments = (Long, Int, Array[Long], Array[Long])

  /** One pass of exact long moment sums over the embedding column via
    * `treeAggregate` — triangles merge EXECUTOR-SIDE in log-depth
    * rounds, so the driver ever holds O(treeFanIn) triangles, not one
    * per corpus partition (a collect of per-partition triangles is a
    * ~26 GB driver bottleneck at 100k partitions x d=256). Long
    * addition is associative, so the result is bitwise identical to
    * the old collect-and-merge for ANY partitioning or merge order.
    * `quantRow` adds one row's contribution into (s1, s2).
    */
  private def momentSums(embs: DataFrame, embCol: String)
                        (quantRow: (Array[Float], Array[Long], Array[Long]) => Unit)
      : (Long, Array[Long], Array[Long]) = {
    val spark = embs.sparkSession
    import spark.implicits._
    val zero: Moments = (0L, -1, null, null)
    val seqOp = (acc: Moments, v: Array[Float]) => {
      val (n, d0, s10, s20) = acc
      val d = if (d0 < 0) v.length else d0
      val s1 = if (s10 == null) new Array[Long](d) else s10
      val s2 = if (s20 == null) new Array[Long](d * (d + 1) / 2) else s20
      require(v.length == d, s"ragged embedding: ${v.length} vs $d")
      quantRow(v, s1, s2)
      (n + 1, d, s1, s2)
    }
    val combOp = (a: Moments, b: Moments) => {
      if (a._2 < 0) b
      else if (b._2 < 0) a
      else {
        // The per-row ragged check is accumulator-local; two internally
        // consistent accumulators with different widths would otherwise
        // merge into a silently truncated (or AIOOBE-crashing) matrix.
        require(a._2 == b._2,
          s"ragged embedding across partitions: ${b._2} vs ${a._2}")
        var i = 0
        while (i < a._3.length) { a._3(i) += b._3(i); i += 1 }
        var t = 0
        while (t < a._4.length) { a._4(t) += b._4(t); t += 1 }
        (a._1 + b._1, a._2, a._3, a._4)
      }
    }
    val (n, d, s1, s2) =
      embs.select(col(embCol)).as[Array[Float]].rdd
        .treeAggregate(zero)(seqOp, combOp)
    require(d >= 0, "empty embedding frame")
    (n, s1, s2)
  }

  /** One-pass quantized (mean, covariance) of a FLOAT[] embedding
    * column. Returns (n, mean[D], cov[D][D]).
    */
  def covariance(embs: DataFrame, embCol: String): (Long, Array[Double], Array[Array[Double]]) = {
    val (n, s1, s2) = momentSums(embs, embCol) { (v, s1, s2) =>
      val d = s1.length
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
    val d = s1.length
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

  // ------------------------------------------------- integer-lattice PCA
  // The ORACLE-exact face: every arithmetic step below is long-integer
  // (lattice quantization, exact scatter sums, truncating-division
  // renormalization), so an independent engine replaying the same
  // recipe — DuckDB in q_embed_pca_project's oracle — produces the
  // IDENTICAL component and projections, bit for bit, for any row
  // order. The float `covariance`/`topComponents` pair above remains
  // the analysis-quality path; this one trades eigensolve polish for a
  // cross-engine contract (the Lloyd-trained-centroid discipline).

  /** Lattice scale of the power-iteration vector (and of the component
    * output): max |v_i| is held near this between rounds.
    */
  val IterScale = 1000L

  /** One-pass exact scatter sums on the embedding lattice
    * (qx = floor(x·1000), the [[graft.functions.VectorFunctions]]
    * lattice): returns (n, S1[D] = Σ qx_i,
    * S2 upper-triangle row-major = Σ qx_i·qx_j). All long-exact —
    * |qx| ≤ ~8000 keeps products < 2^27 and corpus sums < 2^63 up to
    * ~10^13 rows.
    */
  def latticeScatter(embs: DataFrame, embCol: String): (Long, Array[Long], Array[Long]) =
    momentSums(embs, embCol) { (v, s1, s2) =>
      val d = s1.length
      val q = new Array[Long](d)
      var i = 0
      while (i < d) {
        q(i) = math.floor(v(i).toDouble * 1000.0).toLong
        i += 1
      }
      i = 0
      var t = 0
      while (i < d) {
        s1(i) += q(i)
        var j = i
        while (j < d) { s2(t) += q(i) * q(j); j += 1; t += 1 }
        i += 1
      }
    }

  /** Integer division truncating toward zero — Java `/`, Spark `div`
    * and DuckDB `//` all truncate (verified empirically: DuckDB
    * `-7 // 2 = -3`), so plain truncation is the division both engines
    * replay identically.
    */
  private def tdiv(a: Long, b: Long): Long = a / b

  /** The scaled integer scatter matrix C ≈ 10^4 · (n²·cov on the
    * lattice) / n², from [[latticeScatter]] sums: M_ij = n·S2_ij −
    * S1_i·S1_j (= n² times the covariance — exact), then C_ij =
    * floor(M_ij / (floor(n²/10^4)+1)) so C is INDEPENDENT of corpus
    * size (no overflow at any n) while keeping ~4 decimal digits of
    * covariance resolution. M itself is n²-scaled (M = n²·cov on the
    * lattice — it EXCEEDS a long somewhere around n ~ 10^7 at typical
    * coordinate magnitudes), so both M and the division stay in BigInt
    * and only the bounded QUOTIENT narrows to long; BigInt division
    * truncates toward zero exactly like DuckDB's HUGEINT `//`, which
    * is how the oracle computes the same step.
    */
  def latticeScatterMatrix(n: Long, s1: Array[Long],
                           s2: Array[Long]): Array[Array[Long]] = {
    val d = s1.length
    val denom = BigInt(n) * BigInt(n) / 10000L + 1
    val c = Array.ofDim[Long](d, d)
    var i = 0
    var t = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val m = BigInt(n) * BigInt(s2(t)) - BigInt(s1(i)) * BigInt(s1(j))
        val q = m / denom
        require(q.isValidLong, s"scatter quotient overflows long at ($i,$j)")
        val v = q.toLong
        c(i)(j) = v
        c(j)(i) = v
        j += 1; t += 1
      }
      i += 1
    }
    c
  }

  /** Dominant eigenvector of the scaled scatter matrix by INTEGER power
    * iteration: v⁰_i = IterScale; each round w = C·v (exact long —
    * |C| ≤ ~6.4·10^7 at |x| ≤ 8, so |w| ≤ D·|C|·IterScale < 2^53),
    * then renormalize v = trunc(w / (trunc(max|w|/IterScale)+1)). A
    * deterministic, division-semantics-pinned recipe both engines
    * replay identically. Sign canonicalized: the first max-|v|
    * coordinate is non-negative.
    */
  def latticePowerIter(c: Array[Array[Long]], iters: Int): Array[Long] = {
    val d = c.length
    var v = Array.fill(d)(IterScale)
    for (_ <- 0 until iters) {
      val w = new Array[Long](d)
      var i = 0
      while (i < d) {
        var s = 0L
        var j = 0
        while (j < d) { s += c(i)(j) * v(j); j += 1 }
        w(i) = s
        i += 1
      }
      var mx = 0L
      i = 0
      while (i < d) { val a = math.abs(w(i)); if (a > mx) mx = a; i += 1 }
      val q = tdiv(mx, IterScale) + 1
      v = w.map(tdiv(_, q))
    }
    // canonical sign: first coordinate attaining max |v| must be >= 0
    val mx = v.map(math.abs).max
    val first = v.indexWhere(x => math.abs(x) == mx)
    if (first >= 0 && v(first) < 0) v.map(x => -x) else v
  }

  /** Map-only integer projection onto a lattice component: score =
    * Σ_i (n·qx_i − S1_i)·v_i — exact long, n-scaled so no division
    * touches the per-row path (the mean enters as S1, not S1/n).
    */
  def latticeProjectExpr(embCol: Column, n: Long, s1: Array[Long],
                         v: Array[Long]): Column = {
    import graft.functions.VectorFunctions.latticeVal
    s1.indices.map { i =>
      (lit(n) * latticeVal(element_at(embCol, i + 1)) - lit(s1(i))) * lit(v(i))
    }.reduce(_ + _)
  }
}
