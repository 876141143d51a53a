package graft

import org.apache.spark.sql.functions._

import graft.operators.Pca

/** Distributed PCA: recovers planted principal axes, decorrelates the
  * projections, and is reproducible under repartitioning (the only
  * float nondeterminism is partial-merge order — axes must agree to
  * far below any rounding the catalog applies).
  */
class PcaSpec extends SparkSpec {

  private val dim = 16

  /** Deterministic gaussians via Box-Muller over a seeded Random. */
  private def planted(n: Int, seed: Int): Seq[(Long, Seq[Double])] = {
    val rnd = new scala.util.Random(seed)
    // Two fixed orthogonal axes: e0+e1 and e2-e3 (normalized).
    val v1 = Array.tabulate(dim)(i => if (i == 0 || i == 1) 1.0 / math.sqrt(2) else 0.0)
    val v2 = Array.tabulate(dim)(i =>
      if (i == 2) 1.0 / math.sqrt(2) else if (i == 3) -1.0 / math.sqrt(2) else 0.0)
    (1 to n).map { id =>
      val a = rnd.nextGaussian() * 10.0 // dominant variance 100
      val b = rnd.nextGaussian() * 3.0  // second variance 9
      val noise = Array.fill(dim)(rnd.nextGaussian() * 0.05)
      val x = Array.tabulate(dim)(i => 5.0 + a * v1(i) + b * v2(i) + noise(i))
      (id.toLong, x.toSeq)
    }
  }

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    val d = a.zip(b).map { case (x, y) => x * y }.sum
    d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
  }

  test("fit recovers planted axes with descending explained variance") {
    import spark.implicits._
    val df = planted(4000, seed = 7).toDF("id", "vec").repartition(8)
    val m = Pca.fit(df, $"vec", dim, k = 2)

    val v1 = Array.tabulate(dim)(i => if (i == 0 || i == 1) 1.0 / math.sqrt(2) else 0.0)
    val v2 = Array.tabulate(dim)(i =>
      if (i == 2) 1.0 / math.sqrt(2) else if (i == 3) -1.0 / math.sqrt(2) else 0.0)
    assert(math.abs(cos(m.components(0), v1)) > 0.999,
      s"PC1 misaligned: cos=${cos(m.components(0), v1)}")
    assert(math.abs(cos(m.components(1), v2)) > 0.999,
      s"PC2 misaligned: cos=${cos(m.components(1), v2)}")
    assert(m.variances(0) > m.variances(1) && m.variances(1) > 0.0)
    // Planted variances were 100 and 9; noise adds ~2.5e-3 per dim.
    assert(math.abs(m.variances(0) - 100.0) < 10.0)
    assert(math.abs(m.variances(1) - 9.0) < 1.5)
    // Unit-norm axes, sign canonicalized (largest-|entry| positive).
    m.components.foreach { c =>
      assert(math.abs(math.sqrt(c.map(x => x * x).sum) - 1.0) < 1e-9)
      assert(c(c.zipWithIndex.maxBy { case (x, _) => math.abs(x) }._2) > 0.0)
    }
    assert(m.n == 4000 && math.abs(m.mean(5) - 5.0) < 0.1)
  }

  test("projections are centered and decorrelated") {
    import spark.implicits._
    val df = planted(4000, seed = 7).toDF("id", "vec")
    val m = Pca.fit(df, $"vec", dim, k = 2)
    val proj = Pca.project(df, $"vec", m)
    val stats = proj.agg(
      avg($"pc1"), avg($"pc2"),
      covar_pop($"pc1", $"pc2"),
      var_pop($"pc1"), var_pop($"pc2")).head()
    assert(math.abs(stats.getDouble(0)) < 1e-9 && math.abs(stats.getDouble(1)) < 1e-9)
    // Projections onto distinct eigenvectors are uncorrelated; their
    // variances are the eigenvalues.
    assert(math.abs(stats.getDouble(2)) < 1e-6)
    assert(math.abs(stats.getDouble(3) - m.variances(0)) < 1e-6)
    assert(math.abs(stats.getDouble(4) - m.variances(1)) < 1e-6)
  }

  test("refit under different partitioning reproduces the model to 1e-9") {
    import spark.implicits._
    val rows = planted(2000, seed = 13)
    val a = Pca.fit(rows.toDF("id", "vec").repartition(3), $"vec", dim, k = 3)
    val b = Pca.fit(rows.toDF("id", "vec").repartition(17), $"vec", dim, k = 3)
    a.components.zip(b.components).foreach { case (ca, cb) =>
      ca.zip(cb).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9) }
    }
    a.variances.zip(b.variances).foreach { case (x, y) =>
      assert(math.abs(x - y) < 1e-9)
    }
  }

  test("jacobiEigen solves a known symmetric matrix") {
    // [[2,1],[1,2]] has eigenpairs (3, [1,1]/√2) and (1, [1,-1]/√2).
    val (vals, vecs) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val pairs = vals.zipWithIndex.sortBy(-_._1)
    assert(math.abs(pairs(0)._1 - 3.0) < 1e-12 && math.abs(pairs(1)._1 - 1.0) < 1e-12)
    val top = Array(vecs(0)(pairs(0)._2), vecs(1)(pairs(0)._2))
    assert(math.abs(math.abs(top(0)) - 1.0 / math.sqrt(2)) < 1e-12)
    assert(math.abs(top(0) - top(1)) < 1e-12) // same sign, equal entries
  }
}
