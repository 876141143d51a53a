package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Jaro-Winkler similarity as a native expression — Spark ships
  * `levenshtein` but no Jaro-Winkler, and the entity-resolution
  * verify stage (q138) runs this per candidate pair inside blocks,
  * so it must be allocation-light and UDF-free.
  *
  * Semantics are pinned to the conventional definition (and verified
  * bit-for-bit against DuckDB's `jaro_winkler_similarity` in
  * JaroWinklerSpec + the q138 oracle hash-match):
  *   - match window = max(|a|,|b|)/2 − 1 (floor, min 0);
  *   - transpositions = half the matched-but-misordered count;
  *   - jaro = (m/|a| + m/|b| + (m−t)/m) / 3, 0 when m = 0;
  *   - Winkler prefix boost (p = 0.1, prefix capped at 4) applied
  *     ONLY when jaro > 0.7: jw = jaro + l·p·(1−jaro).
  *
  * Comparison is per Java char; the corpus is ASCII so this agrees
  * with any codepoint- or byte-wise engine. O(|a|·window) worst case
  * with two small boolean scratch arrays per call — the blocked join
  * bounds pair counts, so the expression is the verify cost, not the
  * candidate-generation cost.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"JaroWinkler requires two strings, got ($l, $r)")
    }

  override def nullSafeEval(leftVal: Any, rightVal: Any): Any = {
    val a = leftVal.asInstanceOf[UTF8String].toString
    val b = rightVal.asInstanceOf[UTF8String].toString
    JaroWinkler.similarity(a, b)
  }

  /** Unlike the per-element array loops that stay CodegenFallback
    * (boxing is dwarfed by loop cost there), JW runs once per verify
    * pair inside a join condition/filter — a fallback here would
    * break the enclosing WholeStageCodegen span. Emit a static call
    * into the same scalar kernel instead. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinkler.similarity($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  def similarity(a: String, b: String): Double = {
    if (a == b) return 1.0
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var matches = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb, i + window + 1)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!mb(j) && a.charAt(i) == b.charAt(j)) {
          ma(i) = true; mb(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    val jaro = (m / la + m / lb + (m - t / 2) / m) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxL = math.min(4, math.min(la, lb))
    while (l < maxL && a.charAt(l) == b.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }

  def apply(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnInterop
    ColumnInterop.column(
      JaroWinkler(ColumnInterop.expression(a), ColumnInterop.expression(b)))
  }
}
