package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Jaccard similarity of two SORTED DISTINCT long arrays via one
  * sorted-merge pass: |A∩B| counted in O(|A|+|B|) long comparisons
  * with zero allocation, union = |A|+|B|−|A∩B|.
  *
  * The set-similarity verify stage (q98's exact PPJoin verify) runs
  * this per CANDIDATE PAIR — with `array_intersect`/`array_union`
  * each pair builds two hash sets and materializes two result arrays
  * only to take their sizes; sorting each doc's hashed shingles ONCE
  * (`array_sort`, 50k docs) and merging per pair (125k pairs at
  * sf0.1) moves the work from the quadratic side to the linear side.
  * Result is bit-identical: the ratio is computed from exact integer
  * counts either way.
  *
  * Inputs MUST be sorted ascending with no duplicates (the
  * `array_sort(transform(array_distinct(...), xxhash64))` pipeline
  * guarantees both); null elements are not expected (xxhash64 of a
  * non-null string is non-null).
  */
case class JaccardSortedLongs(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"JaccardSortedLongs requires two array<bigint>, got ($l, $r)")
    }

  override def nullSafeEval(leftVal: Any, rightVal: Any): Any =
    JaccardSortedLongs.jaccard(
      leftVal.asInstanceOf[ArrayData], rightVal.asInstanceOf[ArrayData])

  /** Static call into the same merge kernel: the loop stays plain
    * JIT-compiled JVM code, but the row boundary stays inside the
    * enclosing WholeStageCodegen span instead of falling back to
    * interpreted eval per candidate pair. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaccardSortedLongs.jaccard($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaccardSortedLongs {

  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = na.toLong + nb - inter
    if (union == 0L) 1.0 else inter.toDouble / union
  }

  def apply(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnInterop
    ColumnInterop.column(
      JaccardSortedLongs(ColumnInterop.expression(a), ColumnInterop.expression(b)))
  }
}
