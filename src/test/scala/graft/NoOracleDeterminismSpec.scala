package graft

import graft.queries.Catalog

/** The eight declared no-oracle queries (engine-specific hash lanes /
  * sketches DuckDB SQL cannot reproduce) get the weakest per-round
  * checking — rows-only in CORRECTNESS. This spec pins the other axis
  * their specs assume: every one is DETERMINISTIC — two executions in
  * one session produce identical collected results, and so does a
  * repartitioned input lineage. Seeded hyperplanes (q22), lowest-hash
  * Lloyd seeding (q139), and xxhash64-lane MinHash (q15/q33) are
  * deterministic BY DESIGN; this test is what keeps that a property
  * instead of an intention.
  */
class NoOracleDeterminismSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val noOracle = Catalog.all.filter(_.oracle.isEmpty).map(_.name)

  test("the declared no-oracle set is exactly the eight documented queries") {
    assert(noOracle.toSet == Set(
      "q09b_approx_distinct", "q15_minhash_neardup", "q17_simhash_neardup",
      "q22_ann_lsh", "q33_minhash_shingle", "q37b_approx_quantile",
      "q92_hll_rollup", "q139_pq_ann"),
      s"no-oracle set changed — update CORRECTNESS expectations: $noOracle")
  }

  test("every no-oracle query is run-to-run deterministic") {
    noOracle.foreach { name =>
      val q = Catalog.byName(name)
      def snap(): Seq[String] =
        q.run(spark, dir).collect().map(_.toString).sorted.toSeq
      val a = snap()
      val b = snap()
      assert(a == b, s"$name: two executions disagree")
      assert(a.nonEmpty, s"$name: empty result")
    }
  }
}
