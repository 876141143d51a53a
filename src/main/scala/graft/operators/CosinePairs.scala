package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => VF}

/** Exact all-pairs cosine-threshold join over dense embeddings — the
  * pair generator behind q21 (embed near-dup) and q103 (semantic
  * dedup).
  *
  * NULL vectors carry no geometry and are EXCLUDED at every entry
  * point (exact / exactBlocked / clustered) — mirroring SQL aggregate
  * null semantics and WeightedQuantile's documented null exclusion;
  * without the filter the primitive-array kernels would NPE mid-task
  * on the first null payload (DegenerateInputsSpec null lane).
  *
  * Replaces the broadcast nested-loop spelling (`a.join(broadcast(b),
  * id_a < id_b)` + per-row DotProduct): that plan materializes every
  * candidate ROW — two 64-double arrays copied into an UnsafeRow per
  * pair, ~1 KB x n^2/2 — before the similarity filter drops 99.95% of
  * them (measured 4.9 s at sf0.1). This kernel keeps the O(n^2 * d)
  * arithmetic but runs it over primitive arrays with zero per-pair
  * allocation and emits ONLY qualifying pairs: one scan job to build
  * the broadcast matrix, one embarrassingly-parallel compute job over
  * strided row ranges (stride = task count, so every task owns an
  * equal share of the triangular work).
  *
  * Why not LSH/IVF candidate generation here: candidates beat
  * all-pairs only when qualifying pairs are well separated from the
  * background. On the corpus this engine is specified against, the
  * qualifying pairs sit AT the threshold — measured at sf0.01/sf0.1:
  * min qualifying cosine 0.4005/0.4000 against t = 0.4, over a
  * near-random 64-dim background (sigma ~ 1/sqrt(64) = 0.125; 14 k
  * pairs in [0.3, 0.4) at sf0.1). Sign-LSH at theta = acos(0.4) ~ 66
  * deg has per-bit agreement p = 1 - theta/pi ~ 0.63, so exact recall
  * on boundary pairs needs ~200 six-bit tables — whose background
  * collisions exceed n^2/2, i.e. MORE work than all-pairs. The same
  * geometry defeats IVF triangle-inequality pruning (cluster radii
  * ~ 90 deg). In high-threshold regimes (cosine >= ~0.7 — true
  * near-dup embeddings) LSH candidates win: use
  * [[graft.functions.VectorFunctions.hyperplaneBuckets]] (q22's
  * machinery). At t ~ 0.4 the exact blocked kernel is the honest
  * plan, and the exactness is what lets these queries hash-match the
  * DuckDB all-pairs oracle.
  *
  * Scale posture: the driver-side collect IS the broadcast build
  * (same as Spark's own BroadcastExchange) — n * d * 8 B, 1 MB at
  * sf0.1, ~5 GB at n = 10 M x 64 d. When the matrix outgrows the
  * broadcast budget, [[exactBlocked]] runs the same inner loop over
  * block PAIRS — ids hash into B row blocks, one task per (i <= j)
  * block pair, each row replicated ~B/2 times — communication
  * O(n * B) instead of a broadcast, arithmetic unchanged
  * (spec-asserted equal to [[exact]]).
  *
  * Determinism contract (oracle hash-match): dot products are
  * sequential index-order folds and the norm is sqrt of the
  * self-dot, sim = dot / (norm_a * norm_b) — bit-identical to
  * [[graft.functions.DotProduct]] and DuckDB's `list_dot_product`
  * per the q13/q21/q31 cross-engine contract.
  */
object CosinePairs {

  private def selfNorm(v: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    math.sqrt(s)
  }

  /** All (id_a < id_b) pairs with cosine >= threshold via block-pair
    * decomposition — the spelling for matrices beyond the broadcast
    * budget: ids hash into `nBlocks` row blocks; one task per
    * (i <= j) block pair receives exactly its two blocks' vectors
    * (each row replicated ~nBlocks/2 times — communication O(n·B)
    * instead of a full broadcast) and runs the same primitive-array
    * inner loop, emitting only qualifying pairs. Same determinism
    * contract as [[exact]]; equality is spec-asserted
    * (PairKernelsSpec).
    */
  def exactBlocked(vecs: Dataset[(Long, Array[Double])], threshold: Double,
                   nBlocks: Int): DataFrame = {
    require(nBlocks > 0)
    val spark = vecs.sparkSession
    import spark.implicits._
    val nPairs = nBlocks * (nBlocks + 1) / 2
    // (blockPair, (blockOfVec, id, vec)) — every vector goes to each
    // block pair its block participates in. Null vectors excluded
    // (object doc).
    val routed = vecs.filter(_._2 != null).rdd.flatMap { case (id, v) =>
      val b = (math.abs(id.hashCode) % nBlocks + nBlocks) % nBlocks
      (0 until nBlocks).map { o =>
        val (i, j) = if (b <= o) (b, o) else (o, b)
        (i * nBlocks - i * (i - 1) / 2 + (j - i), (b, id, v))
      }
    }
    routed
      .groupByKey(math.min(nPairs, spark.sparkContext.defaultParallelism * 2))
      .flatMap { case (pairKey, members) =>
        // Recover (i, j) from the triangular pair index.
        var i = 0
        var rem = pairKey
        while (rem >= nBlocks - i) { rem -= nBlocks - i; i += 1 }
        val j = i + rem
        val all = members.toArray
        val left = all.filter(_._1 == i).sortBy(_._2)
        val right = all.filter(_._1 == j).sortBy(_._2)
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
        def emit(ia: Long, va: Array[Double], na: Double,
                 ib: Long, vb: Array[Double], nb: Double): Unit = {
          val len = math.min(va.length, vb.length)
          var acc = 0.0
          var k = 0
          while (k < len) { acc += va(k) * vb(k); k += 1 }
          val sim = acc / (na * nb)
          if (sim >= threshold) out += (if (ia < ib) (ia, ib, sim) else (ib, ia, sim))
        }
        if (i == j) {
          val norms = left.map(m => selfNorm(m._3))
          var a = 0
          while (a < left.length) {
            var b = a + 1
            while (b < left.length) {
              emit(left(a)._2, left(a)._3, norms(a), left(b)._2, left(b)._3, norms(b))
              b += 1
            }
            a += 1
          }
        } else {
          val lNorms = left.map(m => selfNorm(m._3))
          val rNorms = right.map(m => selfNorm(m._3))
          var a = 0
          while (a < left.length) {
            var b = 0
            while (b < right.length) {
              emit(left(a)._2, left(a)._3, lNorms(a), right(b)._2, right(b)._3, rNorms(b))
              b += 1
            }
            a += 1
          }
        }
        out
      }
      .toDF("id_a", "id_b", "sim")
  }

  /** SemDeDup-style clustered pair generation — the documented
    * production route once the corpus passes the broadcast budget AND
    * the O(n²·d) arithmetic itself is the wall (≥ ~10⁹ vectors, where
    * even [[exactBlocked]]'s perfectly-parallel compute is ~10¹⁸
    * mul-adds): k-means coarse blocks, then the same primitive-array
    * exact kernel WITHIN each block only. Arithmetic drops from
    * n²/2 to Σ n_c²/2 ≈ n²/(2k) dot products; pairs whose members
    * land in different coarse clusters are missed, which is the
    * SemDeDup trade (arXiv:2303.09540) — accepted recall loss for a
    * k-fold compute cut.
    *
    * Lloyd machinery mirrors [[PqAnn.trainCodebooks]]: seedless
    * deterministic init (k lowest-hash vectors via a distributed
    * top-k, never a global window), per-iteration centroid recompute
    * with 6-dp rounding (the q31/q71 cross-engine convention so
    * partial-sum order cannot move an assignment), localCheckpoint
    * between rounds. Emitted sims are bit-identical to [[exact]]'s
    * (same sequential fold), so `clustered ⊆ exact` exactly —
    * spec-asserted, with measured recall (CosinePairsClusteredSpec,
    * sf0.01 embeddings, k=16, 2 Lloyd iters):
    *
    *   - t = 0.4: recall 0.305 (18 of exact's 59 pairs) — the
    *     boundary geometry documented above (near-random background,
    *     pairs AT the threshold) shreds coarse blocking exactly as
    *     predicted; at this threshold the exact kernels remain the
    *     honest plan and q103's headline stays on [[exact]].
    *   - t = 0.7: recall 1.0 (25/25 planted near-duplicates at cosine
    *     ~0.99; the raw corpus's max pairwise cosine is 0.51) — true
    *     near-duplicates co-locate into the same coarse cluster, the
    *     regime SemDeDup targets.
    *
    * Scale knobs: clusters should grow with the corpus (k ≈ n/5 000
    * keeps blocks at the ~5 000-vector sweet spot, Σ n_c² ≈ 5 000·n);
    * `partitions` spreads the per-cluster triangles across tasks.
    */
  def clustered(vecs: Dataset[(Long, Array[Double])], threshold: Double,
                k: Int, iters: Int = 2, partitions: Int = 0): DataFrame = {
    require(k > 0 && iters >= 0)
    val spark = vecs.sparkSession
    import spark.implicits._
    // pinned: every Lloyd iteration's assign(), the seed selection,
    // and the final assignment all re-read this frame — without the
    // checkpoint each re-read re-executes the caller's full upstream
    // lineage, multiplying the dominant corpus-scan cost of the very
    // path whose point is cutting compute. Tracked (not released
    // here): the RETURNED plan reads it too, so release belongs to
    // the caller's quiesce point — Checkpoints.releaseAll().
    // null vectors excluded (object doc) — and the codegen'd norm
    // below would propagate null anyway, poisoning centroid means
    val e = Checkpoints.track(vecs.toDF("id", "v")
      .filter(col("v").isNotNull)
      .withColumn("nrm", sqrt(VF.dot(col("v"), col("v"))))
      .localCheckpoint(eager = false))
    // Seedless init: k lowest-hash vectors. orderBy+limit compiles to
    // a distributed TakeOrdered — no single-partition window over the
    // corpus; the k-row label numbering window IS single-task, over
    // exactly k rows.
    val seeds = e.orderBy(xxhash64(col("id")), col("id")).limit(k)
      .select(col("id"), expr("transform(v, x -> round(x, 6))").as("cv"))
    var cent = seeds
      .withColumn("c_label", (row_number().over(
        Window.orderBy(xxhash64(col("id")), col("id"))) - 1).cast("int"))
      .select(col("c_label"), col("cv"))
      .withColumn("cnrm", sqrt(VF.dot(col("cv"), col("cv"))))
      .localCheckpoint()

    def assign(c: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("id")).orderBy(col("csim").desc, col("c_label"))
      e.join(broadcast(c))
        .select(col("id"), col("v"), col("c_label"),
          (VF.dot(col("v"), col("cv")) / (col("nrm") * col("cnrm"))).as("csim"))
        .withColumn("arn", row_number().over(w))
        .filter(col("arn") === 1)
        .select(col("id"), col("v"), col("c_label"))
    }

    var it = 0
    while (it < iters) {
      val prev = cent
      cent = assign(prev)
        .select(col("c_label"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("c_label"), col("pos"))
        .agg(round(avg(col("x")), 6).as("cx"))
        .groupBy(col("c_label"))
        .agg(array_sort(collect_list(struct(col("pos"), col("cx")))).as("pairs"))
        .select(col("c_label"), expr("transform(pairs, p -> p.cx)").as("cv"))
        .withColumn("cnrm", sqrt(VF.dot(col("cv"), col("cv"))))
        .localCheckpoint()
      Iterate.unpersistCheckpoint(prev)
      it += 1
    }

    // the final centroid checkpoint survives into the returned plan —
    // tracked for the same caller-quiesce release as `e`
    Checkpoints.track(cent)

    val nParts =
      if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
    assign(cent)
      .select(col("c_label"), col("id"), col("v"))
      .as[(Int, Long, Array[Double])]
      .rdd.map { case (c, id, v) => (c, (id, v)) }
      .groupByKey(math.min(k, nParts))
      .flatMap { case (_, members) =>
        val all = members.toArray.sortBy(_._1)
        val norms = all.map(m => selfNorm(m._2))
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
        var i = 0
        while (i < all.length) {
          val va = all(i)._2
          val na = norms(i)
          var j = i + 1
          while (j < all.length) {
            val vb = all(j)._2
            val len = math.min(va.length, vb.length)
            var acc = 0.0
            var m = 0
            while (m < len) { acc += va(m) * vb(m); m += 1 }
            val sim = acc / (na * norms(j))
            if (sim >= threshold) out += ((all(i)._1, all(j)._1, sim))
            j += 1
          }
          i += 1
        }
        out
      }
      .toDF("id_a", "id_b", "sim")
  }

  /** Hard ceiling on [[exact]]'s driver-side matrix build: 2^18
    * vectors (~134 MB of doubles at dim 64 — comfortably inside a
    * 16 g driver, orders of magnitude above the declared exact tier's
    * gate corpora). A corpus past the ceiling gets a CONTRACT error
    * naming the scale route instead of a driver OOM mid-collect —
    * the same loud-budget style as Ewma/PrefixScan's maxCarry. */
  val maxExactRows: Int = 1 << 18

  /** All (id_a < id_b) pairs with cosine >= threshold, as columns
    * (id_a, id_b, sim); `sim` is the raw double — callers round for
    * presentation. Input ids must be distinct.
    *
    * Declared EXACT tier only (n <= [[maxExactRows]]): the matrix is
    * collected to the driver as the broadcast build. Beyond the
    * ceiling use [[clustered]] (blocked kernel, same within-block
    * arithmetic, recall measured in its scaladoc) or [[exactBlocked]]
    * (exact, no driver matrix).
    */
  def exact(vecs: Dataset[(Long, Array[Double])], threshold: Double): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    // null vectors excluded (object doc); limit BEFORE collect so an
    // over-budget corpus is refused without first materializing it
    // on the driver
    val matrix =
      vecs.filter(_._2 != null).limit(maxExactRows + 1).collect().sortBy(_._1)
    require(matrix.length <= maxExactRows,
      s"CosinePairs.exact collects the full vector matrix to the driver and " +
      s"the input exceeds its exact-tier budget ($maxExactRows rows): use " +
      s"CosinePairs.clustered (blocked production route) or exactBlocked " +
      s"(exact, no driver matrix) instead")
    val n = matrix.length
    val ids = matrix.map(_._1)
    val norms = matrix.map(m => selfNorm(m._2))
    val mats = matrix.map(_._2)
    val bc = spark.sparkContext.broadcast((ids, norms, mats))
    val slices = math.max(1, spark.sparkContext.defaultParallelism)
    spark.sparkContext
      .parallelize(0 until slices, slices)
      // Row i's scan length is n - i, so contiguous chunks would give
      // the first task ~2x the mean work and the last ~0; the stride
      // interleave hands every task an equal slice of the triangle.
      .flatMap { t =>
        val (idsL, normsL, vecsL) = bc.value
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
        var i = t
        while (i < n) {
          val va = vecsL(i)
          val na = normsL(i)
          var j = i + 1
          while (j < n) {
            val vb = vecsL(j)
            val len = math.min(va.length, vb.length)
            var acc = 0.0
            var k = 0
            while (k < len) { acc += va(k) * vb(k); k += 1 }
            val sim = acc / (na * normsL(j))
            if (sim >= threshold) out += ((idsL(i), idsL(j), sim))
            j += 1
          }
          i += slices
        }
        out
      }
      .toDF("id_a", "id_b", "sim")
  }
}
