package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{array, col, explode, greatest, least, struct}

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
    // fail fast on other column names: the struct spelling below
    // resolves src/dst BY NAME — a positional caller with different
    // names would get an opaque analysis error
    require(df.columns.sameElements(Array("src", "dst")),
      s"Symmetrize expects columns (src, dst), got (${df.columns.mkString(", ")})")
    val Array(s, d) = df.schema.fields
    if (s.dataType == d.dataType)
      df.select(explode(array(
          struct(col("src"), col("dst")),
          struct(col("dst").as("src"), col("src").as("dst")))).as("__e"))
        .select(col("__e.src").as("src"), col("__e.dst").as("dst"))
    else
      df.union(df.select(col("dst"), col("src")))
  }

  /** The DISTINCT undirected edge set, both orientations, self-loops
    * dropped — the shape every graph operator here consumes
    * (`Symmetrize(e).filter(src =!= dst).distinct()`), respelled so
    * the distinct runs BEFORE the explode on the CANONICAL
    * orientation: one exchange of |undirected edges| canonical rows
    * instead of one over the 2× exploded frame (guide §2.3 — shuffle
    * fewer bytes; the explode is map-side fan-out after the agg).
    * Exact: with src ≠ dst (strict after the filter; null endpoints
    * fail the inequality in both spellings),
    * distinct(explode(canonical-distinct)) ≡
    * distinct(filter(explode(all))) as a row set. Type-mismatched
    * (src, dst) falls back to the historical union spelling, where
    * least/greatest cannot canonicalize. */
  def undirected(df: DataFrame): DataFrame = {
    require(df.columns.sameElements(Array("src", "dst")),
      s"Symmetrize expects columns (src, dst), got (${df.columns.mkString(", ")})")
    val Array(s, d) = df.schema.fields
    if (s.dataType == d.dataType)
      apply(df.filter(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("src"),
                greatest(col("src"), col("dst")).as("dst"))
        .distinct())
    else
      apply(df).filter(col("src") =!= col("dst")).distinct()
  }
}
