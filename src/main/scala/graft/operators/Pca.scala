package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => VF}

/** Distributed PCA over an embedding column — the dimensionality-
  * reduction step of an embedding pipeline (compact ANN indexes,
  * visualization grids, decorrelated features), computed the way a
  * 100 TB corpus has to compute it:
  *
  *   1. ONE aggregation pass collects the sufficient statistics
  *      (n, Σx, ΣxxT): each partition reduces to a single
  *      d + d(d+1)/2 double buffer (~17 KB at d = 64), so the shuffle
  *      carries one such buffer per map partition — O(partitions·d²)
  *      bytes total, independent of row count.
  *   2. The d×d covariance eigenproblem is solved ON THE DRIVER with
  *      cyclic Jacobi rotations — O(d³) ≈ 3·10⁵ flops at d = 64,
  *      microseconds; there is nothing to distribute. (This caps d at
  *      driver-matrix scale, ~10⁴ dims — the right tradeoff for
  *      embedding widths, which are 64–4096 in practice.)
  *   3. Projection is map-only: components are baked into the plan as
  *      literal arrays, each output dim is one codegen'd
  *      [[graft.functions.DotProduct]] minus a precomputed scalar
  *      (x·c − μ·c  ==  (x−μ)·c), so no per-row centering array is
  *      materialized and no shuffle happens.
  *
  * Determinism: the only float-order nondeterminism is the partial
  * merge order in step 1, which perturbs the covariance at ~1 ulp;
  * Jacobi itself is a fixed cyclic sweep and eigenvector signs are
  * canonicalized (largest-|entry| coordinate made positive), so
  * refitting under any partitioning reproduces components to ~1e-9
  * (spec-asserted). Mirrors the capability a reference user gets from
  * an external analytics stack, re-expressed Spark-first.
  */
object Pca {

  /** Sufficient statistics: row count, per-dim sums, packed
    * upper-triangular gram matrix (row-major, i ≤ j). */
  final case class Moments(n: Long, sums: Array[Double], gram: Array[Double])

  /** Mergeable one-pass moments accumulator. Buffers are mutated in
    * place (Aggregator contract allows it) — zero allocation per row. */
  final class MomentsAgg(dim: Int) extends Aggregator[Seq[Double], Moments, Moments] {
    require(dim > 0, "dim must be positive")

    override def zero: Moments =
      Moments(0L, new Array[Double](dim), new Array[Double](dim * (dim + 1) / 2))

    override def reduce(b: Moments, xs: Seq[Double]): Moments = {
      require(xs.length == dim, s"expected $dim-dim vector, got ${xs.length}")
      val x = xs.toArray
      var i = 0
      var t = 0
      while (i < dim) {
        b.sums(i) += x(i)
        var j = i
        while (j < dim) {
          b.gram(t) += x(i) * x(j)
          t += 1
          j += 1
        }
        i += 1
      }
      Moments(b.n + 1, b.sums, b.gram)
    }

    override def merge(a: Moments, b: Moments): Moments = {
      var i = 0
      while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
      i = 0
      while (i < a.gram.length) { a.gram(i) += b.gram(i); i += 1 }
      Moments(a.n + b.n, a.sums, a.gram)
    }

    override def finish(m: Moments): Moments = m
    override def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
    override def outputEncoder: Encoder[Moments] = Encoders.product[Moments]
  }

  /** Fitted model: `components(j)` is the j-th principal axis (unit
    * vector, descending explained variance `variances(j)`). */
  final case class Model(
      dim: Int,
      n: Long,
      mean: Array[Double],
      components: Array[Array[Double]],
      variances: Array[Double])

  /** One aggregation job + a driver-side d×d eigensolve. */
  def fit(df: DataFrame, vecCol: Column, dim: Int, k: Int): Model = {
    require(k > 0 && k <= dim, "k must be in (0, dim]")
    val agg = udaf(new MomentsAgg(dim))
    val row = df.select(agg(vecCol.cast("array<double>")).as("m")).head().getStruct(0)
    val n = row.getLong(0)
    require(n > 1, s"PCA needs at least 2 rows, got $n")
    val sums = row.getSeq[Double](1).toArray
    val gram = row.getSeq[Double](2).toArray

    val mean = sums.map(_ / n)
    // cov[i][j] = E[x_i x_j] − μ_i μ_j  (population covariance; the
    // 1/n vs 1/(n−1) choice only scales eigenvalues, not axes).
    val cov = Array.ofDim[Double](dim, dim)
    var t = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = gram(t) / n - mean(i) * mean(j)
        cov(i)(j) = c
        cov(j)(i) = c
        t += 1
        j += 1
      }
      i += 1
    }

    val (eigVals, eigVecs) = jacobiEigen(cov)
    // Descending eigenvalue order; index tiebreak keeps it total.
    val order = (0 until dim).sortBy(idx => (-eigVals(idx), idx)).take(k)
    val comps = order.map { idx =>
      val v = Array.tabulate(dim)(r => eigVecs(r)(idx))
      // Sign canonicalization: largest-|entry| coordinate positive
      // (first index on ties) — kills the ±v ambiguity.
      var best = 0
      var r = 1
      while (r < dim) { if (math.abs(v(r)) > math.abs(v(best))) best = r; r += 1 }
      if (v(best) < 0) v.map(-_) else v
    }.toArray
    Model(dim, n, mean, comps, order.map(eigVals).toArray)
  }

  /** Append projection columns `pc1..pck` — map-only, no shuffle:
    * (x−μ)·c spelled as x·c − (μ·c) with the scalar precomputed, so
    * each output dim is a single native dot against a literal axis. */
  def project(df: DataFrame, vecCol: Column, model: Model): DataFrame = {
    val v = vecCol.cast("array<double>")
    model.components.zipWithIndex.foldLeft(df) { case (acc, (comp, j)) =>
      val shift = comp.zip(model.mean).map { case (c, m) => c * m }.sum
      acc.withColumn(s"pc${j + 1}",
        VF.dot(v, typedlit(comp.toSeq)) - lit(shift))
    }
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix.
    * Returns (eigenvalues, eigenvector matrix with eigenvectors as
    * COLUMNS). Deterministic: fixed sweep order, fixed tolerance. */
  private[graft] def jacobiEigen(
      aIn: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = aIn.length
    val a = Array.tabulate(n, n)((i, j) => aIn(i)(j))
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)

    def offNorm(): Double = {
      var s = 0.0
      var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) { s += a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      s
    }

    var sweep = 0
    while (offNorm() > 1e-20 && sweep < 100) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (math.abs(apq) > Double.MinPositiveValue) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val tRot =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              else 1.0 / (theta - math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(tRot * tRot + 1.0)
            val s = tRot * c
            val app = a(p)(p); val aqq = a(q)(q)
            a(p)(p) = c * c * app - 2.0 * s * c * apq + s * s * aqq
            a(q)(q) = s * s * app + 2.0 * s * c * apq + c * c * aqq
            a(p)(q) = 0.0; a(q)(p) = 0.0
            var i = 0
            while (i < n) {
              if (i != p && i != q) {
                val aip = a(i)(p); val aiq = a(i)(q)
                a(i)(p) = c * aip - s * aiq; a(p)(i) = a(i)(p)
                a(i)(q) = s * aip + c * aiq; a(q)(i) = a(i)(q)
              }
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }
}
