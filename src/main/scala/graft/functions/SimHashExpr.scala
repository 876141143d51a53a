package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native 64-bit SimHash over a token array — bit-identical to the
  * higher-order-function form in [[TextFunctions.simhash64]]'s
  * original composition (per-token `xxhash64` seed 42, MSB-first
  * counter order, sign pack), but one tight JVM loop per row instead
  * of 64 interpreted lambda dispatches per token. Same rationale and
  * structure as [[MinHashSignature]]; codegen is a static call into
  * the fused kernel, keeping the WholeStageCodegen span unbroken.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"SimHash64 requires array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    SimHash64.hash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.SimHash64.hash($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {

  def hash(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      // Spark's xxhash64 function semantics: XXH64 of the UTF-8 bytes,
      // seed 42; a NULL element passes the seed through unchanged
      // (matching xxhash64(null) in the HOF reference composition)
      val h =
        if (s == null) 42L
        else XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
      var b = 0
      while (b < 64) {
        // counts(0) tracks bit 63 (MSB-first, matching the HOF masks)
        if ((h & (1L << (63 - b))) != 0L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var acc = 0L
    var b = 0
    while (b < 64) {
      acc = (acc << 1) | (if (counts(b) > 0) 1L else 0L)
      b += 1
    }
    acc
  }

  def apply(tokens: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnInterop
    ColumnInterop.column(SimHash64(ColumnInterop.expression(tokens)))
  }
}
