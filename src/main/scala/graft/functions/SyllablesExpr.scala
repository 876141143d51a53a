package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Total syllable estimate of a token array: per token, the number of
  * `[aeiouy]+` vowel groups, floored at 1; summed over the array.
  *
  * Bit-identical to the HOF reference composition
  * `aggregate(tokens, 0, (acc, w) -> acc + greatest(1,
  * size(regexp_extract_all(w, '[aeiouy]+'))))` — vowel-group counting
  * is just counting non-vowel→vowel transitions, so the regex
  * machinery (one compiled-pattern matcher allocation per token, per
  * row) collapses into a single branch-free char scan per document.
  * Codegen emits a static call into the same scalar kernel so the
  * row boundary stays inside the enclosing WholeStageCodegen span.
  *
  * ASCII-lowercase input is the caller's contract (q116 lowercases
  * first), matching what the regex form would see.
  */
case class SyllableCount(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"SyllableCount requires array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    SyllableCount.count(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.SyllableCount.count($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SyllableCount {

  private def isVowel(c: Byte): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y'

  def count(arr: ArrayData): Long = {
    val n = arr.numElements()
    var total = 0L
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        // vowel groups = count of positions where a vowel starts a run;
        // UTF8String bytes: multi-byte codepoints have the high bit set,
        // so they never compare equal to ASCII vowels — exactly the
        // regex's behavior on non-ASCII input.
        val bytes = s.getBytes
        var groups = 0L
        var inGroup = false
        var j = 0
        while (j < bytes.length) {
          val v = isVowel(bytes(j))
          if (v && !inGroup) groups += 1
          inGroup = v
          j += 1
        }
        total += math.max(1L, groups)
      } else {
        // regexp_extract_all(null) -> null; greatest(1, null) = 1 in the
        // HOF form's fold (greatest ignores nulls), keep that behavior
        total += 1L
      }
      i += 1
    }
    total
  }

  def apply(tokens: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnInterop
    ColumnInterop.column(SyllableCount(ColumnInterop.expression(tokens)))
  }
}
