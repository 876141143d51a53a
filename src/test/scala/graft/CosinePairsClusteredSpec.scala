package graft

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

import graft.operators.CosinePairs
import graft.functions.{VectorFunctions => VF}

class CosinePairsClusteredSpec extends SparkSpec {

  private def vecs: Dataset[(Long, Array[Double])] = {
    import spark.implicits._
    graft.sources.Tables(spark, "/root/testdata/sf0.01", "embeddings")
      .select(col("vec_id").cast("long"), VF.asDouble(col("embedding")).as("v"))
      .as[(Long, Array[Double])]
  }

  private def pairs(d: org.apache.spark.sql.DataFrame): Map[(Long, Long), Double] =
    d.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  private def subsetAndRecall(v: Dataset[(Long, Array[Double])], t: Double,
                              k: Int): Double = {
    val ex = pairs(CosinePairs.exact(v, t))
    val cl = pairs(CosinePairs.clustered(v, t, k = k, iters = 2))
    cl.foreach { case (key, sim) =>
      assert(ex.get(key).contains(sim),
        s"t=$t: pair $key missing from exact or sim drifted")
    }
    assert(ex.nonEmpty, s"t=$t: fixture has no exact pairs")
    val recall = cl.size.toDouble / ex.size
    info(f"t=$t%.1f recall=$recall%.3f (${cl.size}/${ex.size})")
    recall
  }

  test("t=0.4 boundary regime: clustered ⊆ exact, low recall is the documented trade") {
    // the corpus is the near-random background the CosinePairs scaladoc
    // measures (max pairwise cosine 0.51): qualifying pairs sit AT the
    // threshold, so coarse blocking legitimately shreds recall — this
    // is exactly why q103's headline stays on the exact kernel
    val v = vecs.cache()
    try assert(subsetAndRecall(v, 0.4, k = 16) >= 0.2)
    finally v.unpersist()
  }

  test("t=0.7 near-dup regime: planted near-duplicates co-locate, recall high") {
    import spark.implicits._
    // the SemDeDup regime needs actual near-duplicates, which the
    // random-background corpus lacks: plant one perturbed copy of
    // every 20th vector (cosine ~0.99 to its base); the background
    // never reaches 0.7, so exact@0.7 is exactly the planted pairs
    val base = vecs.collect()
    val rnd = new scala.util.Random(123)
    val planted = base.filter(_._1 % 20 == 0).map { case (id, v) =>
      (id + 1000000L, v.map(x => x + rnd.nextGaussian() * 0.02))
    }
    val v = spark.createDataset(base ++ planted).cache()
    try {
      val recall = subsetAndRecall(v, 0.7, k = 16)
      assert(recall >= 0.85, f"near-dup recall $recall%.3f below 0.85")
    } finally v.unpersist()
  }

  test("clustered is deterministic across runs") {
    val v = vecs
    val a = pairs(CosinePairs.clustered(v, 0.5, k = 8, iters = 2))
    val b = pairs(CosinePairs.clustered(v, 0.5, k = 8, iters = 2))
    assert(a == b)
  }

  test("k=1 single cluster degenerates to exact") {
    val v = vecs
    assert(pairs(CosinePairs.clustered(v, 0.6, k = 1, iters = 1))
      == pairs(CosinePairs.exact(v, 0.6)))
  }
}
