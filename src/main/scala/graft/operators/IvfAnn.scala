package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => VF}

/** IVF-probed approximate nearest neighbors — the scale path for
  * similarity search (used by query q44 and the 10× ScaleSmoke probe;
  * one definition so a parameter tune cannot silently diverge the
  * benchmark from the graded query).
  *
  * Cells are the `label` column (the coarse quantizer — per-label
  * centroids as in q31). Per query: rank centroids by cosine, probe
  * the top-`nprobe` cells, brute-force ONLY inside probed cells. With
  * nlist cells the candidate scan reads ~nprobe/nlist of the corpus;
  * centroids and the query set ride broadcast joins, so the corpus
  * side is filtered before any wide shuffle. Centroid components are
  * rounded to 6 dp so cross-engine/AQE partial-sum order cannot leak
  * into the ranking (same rationale as q31).
  */
object IvfAnn {

  /** @param e     (vec_id, label, v: array<double>) corpus
    * @param isQuery predicate over `e` rows selecting the query set
    * @return (qid, nid, rank: long, sim) — exact cosine ranking within
    *         the probed cells, `rank <= k`
    */
  def topK(e: DataFrame, isQuery: Column, nprobe: Int, k: Int): DataFrame = {
    val centroids = e
      .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(round(avg(col("x")), 6).as("cx"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("cx")))).as("pairs"))
      .select(col("label").as("c_label"),
              expr("transform(pairs, p -> p.cx)").as("cv"))
      .withColumn("cnrm", sqrt(VF.dot(col("cv"), col("cv"))))
    val q = e.filter(isQuery)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
      .withColumn("qnrm", sqrt(VF.dot(col("qv"), col("qv"))))
    val wq = Window.partitionBy(col("qid")).orderBy(col("csim").desc, col("c_label"))
    val probes = q.join(broadcast(centroids))
      .select(col("qid"), col("qv"), col("qnrm"), col("c_label"),
              (VF.dot(col("qv"), col("cv")) / (col("qnrm") * col("cnrm"))).as("csim"))
      .withColumn("crn", row_number().over(wq))
      .filter(col("crn") <= nprobe)
      .select(col("qid"), col("qv"), col("qnrm"), col("c_label"))
    val sims = e
      .withColumn("nrm", sqrt(VF.dot(col("v"), col("v"))))
      .join(broadcast(probes),
            col("label") === col("c_label") && col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
              (VF.dot(col("v"), col("qv")) / (col("nrm") * col("qnrm"))).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    sims.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
