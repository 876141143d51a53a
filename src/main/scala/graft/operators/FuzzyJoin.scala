package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance self-join via deletion-neighborhood signatures
  * (the FastSS scheme, Bocek et al. 2007 — public literature).
  *
  * The 100 TB problem: "names within edit distance 1" spelled naively
  * is an O(n²) cross join gated by `levenshtein` — a
  * BroadcastNestedLoopJoin that stops scaling the moment the build
  * side outgrows one executor. The signature scheme turns it into an
  * equi-join: every string emits itself plus each string obtainable by
  * deleting ONE character (|s|+1 signatures). Two strings s, t with
  * ed(s, t) ≤ 1 always share a signature:
  *
  *   - ed 0: s itself.
  *   - substitution at p: deleting p from both sides yields the same
  *     string.
  *   - insertion/deletion: the shorter string IS a deletion signature
  *     of the longer, and is its own 0-deletion signature.
  *
  * So candidates = pairs sharing any signature (shuffle equi-join on
  * the signature key, ~|s| rows per input row), and the exact bounded
  * `levenshtein(_, _, 1)` verify removes the false positives (e.g.
  * two different deletions colliding at ed 2). Signature buckets stay
  * small under real key distributions (a bucket is "strings one
  * deletion away from the same residue"), so the join output is near
  * the true result size instead of n².
  */
object FuzzyJoin {

  /** `s` plus every string formed by deleting one character of `s`. */
  def deletionNeighborhood(c: Column): Column =
    transform(sequence(lit(0), length(c)), i =>
      when(i === 0, c)
        .otherwise(concat(c.substr(lit(1), i - 1),
                          c.substr(i + 1, length(c) - i))))

  /** All unordered pairs (k1 < k2) of rows whose `strCol` values are
    * within edit distance 1, with the exact distance. Output columns:
    * `k1, k2, dist` (dist ∈ {0, 1}).
    */
  def editDistance1SelfJoin(df: DataFrame, keyCol: String, strCol: String): DataFrame = {
    val base = df.select(col(keyCol).as("__k"), col(strCol).as("__s"))
      .filter(col("__s").isNotNull)
    val sigs = base
      .select(col("__k"), col("__s"),
        explode(array_distinct(deletionNeighborhood(col("__s")))).as("__sig"))
    val cand = sigs.select(col("__k").as("k1"), col("__sig"))
      .join(sigs.select(col("__k").as("k2"), col("__sig")), Seq("__sig"))
      .filter(col("k1") < col("k2"))
      .select(col("k1"), col("k2"))
      .dropDuplicates("k1", "k2")
    cand
      .join(base.select(col("__k").as("k1"), col("__s").as("__s1")), Seq("k1"))
      .join(base.select(col("__k").as("k2"), col("__s").as("__s2")), Seq("k2"))
      .withColumn("dist", levenshtein(col("__s1"), col("__s2"), 1))
      .filter(col("dist") >= 0)
      .select(col("k1"), col("k2"), col("dist").cast("long").as("dist"))
  }
}
