package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`,
  * on in [[graft.engine.Graft]]) handles most skew at runtime; this
  * explicit rewrite is for the pathological case AQE can't fix — a
  * single hot key whose *build side* row group exceeds one task's
  * memory, or a non-AQE context (streaming foreachBatch merges).
  *
  * Left rows get a random-but-deterministic salt in [0, buckets);
  * right rows are replicated once per salt value. The join key becomes
  * (key, salt), spreading each hot key over `buckets` tasks. Cost:
  * right side × buckets — use with a small/medium right side, or
  * pre-filter the hot keys and salt only those (hybrid pattern).
  */
object SkewJoin {

  /** Inner equi-join `left.key == right.key` with the left side's hot
    * keys spread over `buckets` salt partitions.
    *
    * The salt is derived ONLY from deterministic row content —
    * `xxhash64` over every left column — so a task retry or
    * speculative re-execution recomputes the identical salt for the
    * identical row. (A salt fed by `monotonically_increasing_id()` or
    * `rand()` is a correctness hazard: it is assigned per partition
    * layout, so a retried stage can re-salt rows differently and drop
    * or duplicate them across the shuffle.) Fully identical duplicate
    * rows share a salt and thus a task; skew relief comes from payload
    * variety under the hot key, which is the common case.
    */
  def saltedInner(left: DataFrame, right: DataFrame,
                  leftKey: String, rightKey: String,
                  buckets: Int): DataFrame = {
    require(buckets > 0)
    val l = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(buckets)).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    // Qualify both keys via the captured frames: bare col(...) fails
    // analysis when leftKey == rightKey (both sides expose the name).
    l.join(r, l("__salt") === r("__salt") && l(leftKey) === r(rightKey))
      .drop("__salt")
  }
}
