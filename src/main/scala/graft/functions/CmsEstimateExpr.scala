package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Probe a serialized Count-Min sketch for an item's estimated count.
  *
  * Spark ships the BUILD side of CMS (`count_min_sketch(col, eps,
  * confidence, seed)` — a mergeable `TypedImperativeAggregate` whose
  * partials combine cell-wise, so per-partition/per-day sketches roll
  * up to any grain like sums) but no SQL-level probe; the only reader
  * is `DataFrameStatFunctions.countMinSketch`'s driver-side object.
  * This expression is the missing probe: heavy-hitter queries stay
  * declarative — build the sketch in one aggregation, broadcast the
  * single binary row, probe per candidate key.
  *
  * Item hashing mirrors `CountMinSketchAgg.update` exactly: integral
  * types probe as longs, strings as their UTF-8 bytes — so estimates
  * match what the aggregate inserted. Structural guarantee:
  * estimate ≥ true count always (cell collisions only inflate), and
  * estimate ≤ true + eps·N with probability ≥ confidence.
  *
  * CodegenFallback: the probe side is a handful of candidate keys per
  * sketch, never the 100 TB fact scan. Deserialized sketches are
  * cached in a small MRU list keyed by byte-array
  * reference-then-content — so the broadcast-literal case (one
  * sketch) deserializes once, and per-group sketches joined onto
  * probes (a few distinct byte arrays INTERLEAVED row-by-row) each
  * deserialize once instead of thrashing a single slot.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ByteType | ShortType | IntegerType | LongType | StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"CmsEstimate requires (binary sketch, integral|string item), got ($l, $r)")
    }

  private val MaxCached = 8
  @transient private var entries: Array[(Array[Byte], CountMinSketch)] = _

  private def sketchFor(bytes: Array[Byte]): CountMinSketch = {
    // Per-entry check is reference first (scalar-subquery/literal
    // sketches re-present the same array), then Arrays.equals (an
    // intrinsified memcmp, ~ns/KB — far cheaper than re-reading 40k
    // longs through a DataInputStream). Hits promote to front; beyond
    // MaxCached distinct sketches the least-recently-used drops off —
    // the probe contract is a FEW sketches per task, not thousands.
    if (entries == null) entries = Array.empty
    var i = 0
    while (i < entries.length) {
      val e = entries(i)
      if ((e._1 eq bytes) || java.util.Arrays.equals(e._1, bytes)) {
        if (i != 0) {
          System.arraycopy(entries, 0, entries, 1, i)
          entries(0) = e
        }
        return e._2
      }
      i += 1
    }
    val s = CountMinSketch.readFrom(bytes)
    val n = math.min(entries.length + 1, MaxCached)
    val next = new Array[(Array[Byte], CountMinSketch)](n)
    next(0) = (bytes, s)
    System.arraycopy(entries, 0, next, 1, n - 1)
    entries = next
    s
  }

  override def nullSafeEval(sketchBytes: Any, item: Any): Any = {
    val cms = sketchFor(sketchBytes.asInstanceOf[Array[Byte]])
    item match {
      case s: UTF8String => cms.estimateCount(s.getBytes)
      case b: java.lang.Byte => cms.estimateCount(b.longValue(): java.lang.Long)
      case sh: java.lang.Short => cms.estimateCount(sh.longValue(): java.lang.Long)
      case i: java.lang.Integer => cms.estimateCount(i.longValue(): java.lang.Long)
      case l: java.lang.Long => cms.estimateCount(l)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CmsEstimate {
  def apply(sketch: Column, item: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnInterop
    ColumnInterop.column(
      CmsEstimate(ColumnInterop.expression(sketch), ColumnInterop.expression(item)))
  }
}
