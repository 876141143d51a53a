package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native word n-gram shingles over a token array: one pass, direct
  * UTF8String concatenation — replaces the `transform(sequence, i ->
  * concat_ws(slice(...)))` composition whose interpreted per-position
  * lambdas dominated the sf0.1 near-dup pipeline.
  *
  * Semantics identical to the HOF form (and the DuckDB oracle of
  * q32): tokens shorter than n collapse to a single whole-text
  * shingle.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {
  require(n > 0, "n must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"WordShingles requires array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    WordShingles.shingle(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.WordShingles.shingle($a, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {

  private val sep = UTF8String.fromString(" ")

  def shingle(arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements()
    def tok(i: Int): UTF8String = arr.getUTF8String(i)
    if (m < n) {
      val all = Array.tabulate(m)(tok)
      new GenericArrayData(Array[Any](UTF8String.concatWs(sep, all: _*)))
    } else {
      val out = new Array[Any](m - n + 1)
      var i = 0
      while (i <= m - n) {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) { parts(j) = tok(i + j); j += 1 }
        out(i) = UTF8String.concatWs(sep, parts: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  def apply(tokens: Column, n: Int): Column = {
    import org.apache.spark.sql.graftshim.ColumnInterop
    ColumnInterop.column(WordShingles(ColumnInterop.expression(tokens), n))
  }
}
