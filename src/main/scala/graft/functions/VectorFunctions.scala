package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType` embedding columns, composed from
  * Spark's higher-order functions (`zip_with`, `aggregate`) so the
  * whole computation stays inside whole-stage codegen — no UDF, no
  * serialization boundary, fully distributed.
  *
  * The fold in [[dot]] is a sequential left fold over array elements,
  * which keeps the floating-point summation order deterministic —
  * required for the oracle hash compare.
  */
object VectorFunctions {

  /** Cast a float embedding to double for stable arithmetic. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Codegen'd native dot product (see [[DotProduct]]); bit-identical
    * to [[dotHof]] but ~an order of magnitude faster in the hot path. */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnInterop
    ColumnInterop.column(
      DotProduct(ColumnInterop.expression(a), ColumnInterop.expression(b)))
  }

  /** Higher-order-function fold — kept as the composition reference
    * and for engines/tests that want pure built-ins. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two double-array columns. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))

  /** Cosine similarity of two float embeddings (casts to double first). */
  def cosineF(a: Column, b: Column): Column = {
    val ad = asDouble(a)
    val bd = asDouble(b)
    cosine(ad, bd)
  }

  /** Squared L2 distance. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0d), (acc, x) => acc + x)

  /** Deterministic pseudo-random hyperplane sign for LSH: the sign of
    * a hash of (plane index, dimension index). Used to build
    * random-hyperplane signatures without any runtime RNG, so results
    * are reproducible across runs and across the cluster.
    */
  private def planeSign(plane: Int, dim: Column): Column =
    when(xxhash64(lit(plane), dim) % 2 === 0, lit(1.0d)).otherwise(lit(-1.0d))

  /** Random-hyperplane (SimHash-style) LSH bucket id for an embedding:
    * `bits` hyperplanes with deterministic +/-1 coefficients; the
    * bucket is the packed sign bits of the dot products. Vectors with
    * high cosine similarity collide with high probability; the bucket
    * id is then a shuffle key for candidate generation at scale
    * (turns O(n^2) similarity search into a per-bucket join).
    */
  def hyperplaneBucket(vec: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 62, "bits must be in (0, 62]")
    val v = asDouble(vec)
    val bitCols = (0 until bits).map { p =>
      // dot(v, plane_p) where plane_p[d] = deterministic +/-1
      val proj = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1), (x, i) => x * planeSign(p, i)),
        lit(0.0d), (acc, x) => acc + x)
      when(proj >= 0, lit(1L)).otherwise(lit(0L))
    }
    // pack bits: acc = acc*2 + bit  (equivalent to shift-or, codegen-friendly)
    bitCols.foldLeft(lit(0L)) { (acc, b) => acc * 2 + b }
  }
}
