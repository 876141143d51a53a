package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native MinHash signature over a string array.
  *
  * The higher-order-function form (`transform(seq(k), s ->
  * array_min(transform(shingles, xxhash64(_, s))))`) dispatches an
  * interpreted expression per (shingle, lane): 128 lanes x ~300
  * shingles x 5000 docs blew the sf0.1 bench past 10 minutes. This
  * expression hashes each shingle ONCE (xxHash64 of its UTF-8 bytes)
  * and derives the k lanes with a SplitMix64-seeded universal-hash
  * transform — O(shingles·bytes + shingles·k) cheap ALU ops in a
  * tight JVM loop, one call per row.
  *
  * Two documents' signatures agree at lane j with probability equal
  * to the Jaccard similarity of their shingle sets (standard MinHash
  * guarantee; the multiply-shift family is 2-universal, which is what
  * banding needs). Deterministic across runs and executors: lane
  * coefficients are a pure function of the lane index.
  *
  * Codegen is a static call into the fused kernel — the hot loop
  * stays plain JIT-compiled JVM code AND the row boundary stays
  * inside the enclosing WholeStageCodegen span (a fallback would
  * break the span for every downstream expression in the stage).
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression {
  require(k > 0 && k <= 1024, "k must be in (0, 1024]")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"MinHashSignature requires array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    MinHashSignature.signature(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.MinHashSignature.signature($a, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {

  // Lane coefficients from SplitMix64 (public-domain mixer): odd
  // multipliers for the 2-universal multiply-xor transform. Cached
  // per k (coefficients are a pure function of the lane index, so
  // every executor derives identical tables).
  private val coefCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()

  private def coefs(k: Int): (Array[Long], Array[Long]) =
    coefCache.computeIfAbsent(k, kk => (
      Array.tabulate(kk)(j => splitmix64(2L * j + 1) | 1L),
      Array.tabulate(kk)(j => splitmix64(2L * j + 2))))

  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def signature(arr: ArrayData, k: Int): ArrayData = {
    val (mulA, addB) = coefs(k)
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
      var j = 0
      while (j < k) {
        // multiply-xor universal hash of the base fingerprint
        val v = (h ^ addB(j)) * mulA(j)
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  def apply(shingles: Column, k: Int): Column = {
    import org.apache.spark.sql.graftshim.ColumnInterop
    ColumnInterop.column(MinHashSignature(ColumnInterop.expression(shingles), k))
  }
}
