package graft.engine

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{
  BitwiseCount, BitwiseXor, Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.functions.{CmsEstimate, DotProduct, JaccardSortedLongs, JaroWinkler, L2Sq, MinHashSignature, SimHash64, SyllableCount, WordShingles}

/** Registers the engine's custom Catalyst expressions as SQL
  * functions, so the full function surface is reachable from
  * `spark.sql(...)` — not only the Scala Column API. Installed by
  * [[Graft.builder]] via `withExtensions`, or externally with
  * `--conf spark.sql.extensions=graft.engine.GraftExtensions`.
  *
  * SQL surface:
  *  - `graft_dot_product(array<double>, array<double>) -> double`
  *  - `graft_word_shingles(array<string>, n) -> array<string>`
  *  - `graft_minhash_signature(array<string>, k) -> array<bigint>`
  *  - `graft_simhash64(array<string>) -> bigint`
  *  - `graft_hamming64(bigint, bigint) -> bigint`
  *  - `graft_cms_estimate(binary, item) -> bigint`
  *  - `graft_jaro_winkler(string, string) -> double`
  *  - `graft_l2sq(array<double>, array<double>) -> double`
  *  - `graft_syllables(array<string>) -> bigint`
  *  - `graft_jaccard_sorted(array<bigint>, array<bigint>) -> double`
  *
  * `n`/`k` must be integer literals: they size the generated code of
  * the underlying expression, so a per-row value cannot apply.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def litInt(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot_product"),
      info("graft_dot_product",
        "graft_dot_product(a, b) - codegen'd sequential-fold dot product of two double arrays"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_dot_product(a, b)")
        DotProduct(args(0), args(1))
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_word_shingles"),
      info("graft_word_shingles",
        "graft_word_shingles(tokens, n) - space-joined word n-grams of a token array"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_word_shingles(tokens, n)")
        WordShingles(args(0), litInt(args(1), "graft_word_shingles", "n"))
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_minhash_signature"),
      info("graft_minhash_signature",
        "graft_minhash_signature(shingles, k) - k-lane MinHash signature of a string array"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_minhash_signature(shingles, k)")
        MinHashSignature(args(0), litInt(args(1), "graft_minhash_signature", "k"))
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64",
        "graft_simhash64(tokens) - 64-bit SimHash of a token array"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_simhash64(tokens)")
        SimHash64(args(0))
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_hamming64"),
      info("graft_hamming64",
        "graft_hamming64(a, b) - Hamming distance of two 64-bit signatures (popcount of xor)"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_hamming64(a, b)")
        Cast(BitwiseCount(BitwiseXor(args(0), args(1))), LongType)
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_cms_estimate"),
      info("graft_cms_estimate",
        "graft_cms_estimate(sketch, item) - estimated count of item in a count_min_sketch binary"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_cms_estimate(sketch, item)")
        CmsEstimate(args(0), args(1))
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_jaro_winkler"),
      info("graft_jaro_winkler",
        "graft_jaro_winkler(a, b) - Jaro-Winkler similarity (0.7 boost threshold, 4-char prefix cap)"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_jaro_winkler(a, b)")
        JaroWinkler(args(0), args(1))
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_l2sq"),
      info("graft_l2sq",
        "graft_l2sq(a, b) - codegen'd sequential-fold squared L2 distance of two double arrays"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_l2sq(a, b)")
        L2Sq(args(0), args(1))
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_syllables"),
      info("graft_syllables",
        "graft_syllables(tokens) - vowel-group syllable estimate of a token array in one fused char scan"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_syllables(tokens)")
        SyllableCount(args(0))
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_jaccard_sorted"),
      info("graft_jaccard_sorted",
        "graft_jaccard_sorted(a, b) - Jaccard similarity of two SORTED distinct bigint arrays (allocation-free merge)"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_jaccard_sorted(a, b)")
        JaccardSortedLongs(args(0), args(1))
      }))
  }
}
