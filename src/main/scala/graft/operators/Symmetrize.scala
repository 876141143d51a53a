package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Undirected-edge symmetrize: (src, dst) → both orientations.
  *
  * The union spelling (`e.union(e.select(dst, src))`) references the
  * edge subplan twice, and the two branches' projections differ, so
  * neither static planning nor runtime exchange reuse dedupes them —
  * the whole edge LINEAGE (often an expensive fact join + distinct)
  * executes twice. This spelling emits both orientations from ONE
  * evaluation via a map-side explode of a two-struct array — no second
  * pass, no checkpoint needed (guide: shuffle/compute once, fan out
  * map-side). Falls back to the union when src/dst types differ (the
  * explode's array() needs one element type; union's coercion then
  * matches the historical behavior).
  */
object Symmetrize {

  /** `df` must have exactly the two columns (src, dst). Returns the
    * same two columns with both orientations of every row; row order
    * and duplicate handling are the caller's (apply `distinct`
    * downstream exactly as with the union spelling). */
  def apply(df: DataFrame): DataFrame = {
    val Array(s, d) = df.schema.fields
    if (s.dataType == d.dataType)
      df.select(explode(array(
          struct(col("src"), col("dst")),
          struct(col("dst").as("src"), col("src").as("dst")))).as("__e"))
        .select(col("__e.src").as("src"), col("__e.dst").as("dst"))
    else
      df.union(df.select(col("dst"), col("src")))
  }
}
