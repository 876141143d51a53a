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

  /** Rows whose embedding has usable geometry: present, non-empty,
    * nonzero norm. The shared entry guard for every cosine-family
    * operator: under ANSI a zero-norm vector's cosine is a hard
    * DIVIDE_BY_ZERO — one all-zero embedding row (a real failure
    * mode of upstream encoders) would otherwise abort the whole job
    * at 100 TB. Degenerate vectors are EXCLUDED, mirroring how SQL
    * aggregates skip nulls (the CosinePairs contract). DuckDB oracle
    * spelling of the same predicate:
    * `list_sum(list_transform(embedding::DOUBLE[], x -> x*x)) > 0`
    * — NULL lists give NULL (excluded), empty lists give NULL sum
    * (excluded), zero vectors give 0 (excluded); unlike
    * list_inner_product it never hard-errors on a NULL argument. */
  def usableVec(e: Column): Column =
    e.isNotNull && size(e) > 0 && dot(asDouble(e), asDouble(e)) > 0

  /** Cosine similarity of two double-array columns. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))

  /** Cosine similarity of two float embeddings (casts to double first). */
  def cosineF(a: Column, b: Column): Column = {
    val ad = asDouble(a)
    val bd = asDouble(b)
    cosine(ad, bd)
  }

  /** Squared L2 distance — codegen'd native (see [[L2Sq]]);
    * bit-identical to [[l2sqHof]]. */
  def l2sq(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnInterop
    ColumnInterop.column(
      L2Sq(ColumnInterop.expression(a), ColumnInterop.expression(b)))
  }

  /** Higher-order-function fold — composition reference for [[l2sq]]. */
  def l2sqHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0d), (acc, x) => acc + x)

  /** Random-hyperplane (SimHash-style) LSH bucket id for an embedding:
    * `bits` hyperplanes with deterministic +/-1 coefficients; the
    * bucket is the packed sign bits of the dot products. Vectors with
    * high cosine similarity collide with high probability; the bucket
    * id is then a shuffle key for candidate generation at scale
    * (turns O(n^2) similarity search into a per-bucket join).
    *
    * The hyperplane matrix is deterministic (seeded MurmurHash3 over
    * (plane, dim)) and baked into the plan as literal arrays, so each
    * row costs `bits` codegen'd [[DotProduct]]s — no per-element hash
    * evaluation at runtime, reproducible across runs and executors.
    *
    * `dim` MUST equal the actual embedding length: [[DotProduct]] folds
    * over min(length), so a shorter plane would silently bucket on a
    * prefix of the vector and degrade LSH recall. A runtime guard
    * raises an error on the first mismatched row rather than truncate.
    */
  def hyperplaneBucket(vec: Column, bits: Int, dim: Int = 64, seed: Int = 42): Column = {
    require(bits > 0 && bits <= 62, "bits must be in (0, 62]")
    val planes: Seq[Column] = (0 until bits).map { p =>
      typedlit((0 until dim).map { d =>
        if ((scala.util.hashing.MurmurHash3.stringHash(s"$p:$d", seed) & 1) == 0) 1.0 else -1.0
      })
    }
    val v = asDouble(vec)
    val packed = planes.foldLeft(lit(0L)) { (acc, plane) =>
      shiftleft(acc, 1).bitwiseOR(when(dot(v, plane) >= 0, lit(1L)).otherwise(lit(0L)))
    }
    // NULL vector -> NULL bucket (no geometry, nothing to probe) —
    // without the isNull branch the dim guard itself misfires:
    // size(NULL) is NULL under ANSI, the when falls through, and
    // raise_error(concat(.., NULL, ..)) throws an unreadable
    // USER_RAISED_EXCEPTION(null) instead of excluding the row
    when(v.isNull, lit(null).cast("long"))
      .when(size(v) === dim, packed)
      .otherwise(raise_error(concat(
        lit(s"hyperplaneBucket: expected $dim-dim embedding, got "),
        size(v).cast("string"), lit(" elements"))))
  }

  /** Multi-table LSH bucket array: `tables` independent hyperplane
    * sets (distinct seeds), one bucket id per table, each tagged with
    * its table index in the high bits so buckets from different
    * tables never collide after the posexplode.
    *
    * Why multiple tables: a single b-bit probe finds a neighbor at
    * angle θ with probability (1−θ/π)^b — for weakly-similar corpora
    * (cosine ~0.35 ⇒ θ ≈ 69°, p ≈ 0.057 at b=6) one table has
    * near-zero recall. L independent tables raise it to
    * 1−(1−p)^L (~0.6 at L=16) while candidate volume stays
    * L·n/2^b per query. When true neighbors are this far apart,
    * sign-LSH is inherently expensive — the IVF path ([[IvfAnn]])
    * is the engine's scale answer for that regime; this operator is
    * the right one when neighbors are close (near-dup embeddings,
    * cosine ≥ 0.8, where p^b per table is large).
    */
  def hyperplaneBuckets(vec: Column, bits: Int, tables: Int,
                        dim: Int = 64): Column = {
    require(tables > 0 && tables <= 64, "tables must be in (0, 64]")
    // NULL vector -> NULL ARRAY, not an array of null buckets: callers
    // explode this column, and explode(NULL) emits ZERO rows — the
    // vector is cleanly excluded — where an array of nulls would emit
    // `tables` null-bucket rows per null vector that every such vector
    // shares (a skew group in any bucket groupBy at scale)
    when(vec.isNull, lit(null).cast("array<bigint>"))
      .otherwise(array((0 until tables).map { t =>
        hyperplaneBucket(vec, bits, dim, seed = 42 + 7919 * t)
          .bitwiseOR(lit(t.toLong << bits))
      }: _*))
  }
}
