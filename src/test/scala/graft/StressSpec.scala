package graft

/** Fast standing variant of the [[StressRun]] concurrency gate: 4
  * threads × 3 rounds × 12 samples over a 24-query subset at sf0.001,
  * every sample hash-compared to the single-threaded reference. The
  * subset is biased toward the machinery with cross-thread state
  * (Checkpoints pins: PrefixScan queries, CosinePairs.clustered, the
  * funnel/pipeline compositions, DupCollapse) plus a spread of joins,
  * windows, and sketches; the full-catalog evidence run is the
  * StressRun main (docs/probes/).
  */
class StressSpec extends SparkSpec {

  private val subset = IndexedSeq(
    // checkpoint-pinning paths (the round-8 bug class)
    "q70_decile_stats", "q78_topk_agg", "q103_semantic_dedup",
    "q139_pq_ann", "q160_weighted_median", "q171_ewma_linear",
    "q166_pretrain_funnel", "q169_funnel_attrition",
    // duplicate-collapse paths (shared fingerprint machinery)
    "q17_simhash_neardup", "q33_minhash_shingle", "q98_prefix_filter_neardup",
    "q138_entity_resolution",
    // a spread of the rest: joins, windows, aggs, text, ANN
    "q02_group_agg", "q03_join_topk", "q07_window_topk", "q08_asof_join",
    "q11_cdc_latest", "q40_sessionize", "q44_ivf_ann", "q50_tfidf",
    "q92_hll_rollup", "q95_funnel", "q101_hopping_window", "q146_zorder_layout")

  test("concurrent random subsets hash-match the single-threaded reference") {
    val missing = subset.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"stress subset names drifted from the catalog: $missing")
    val report = StressRun.run(spark, "/root/testdata/sf0.001", subset,
      threads = 4, rounds = 3, perThread = 12, seed = 11L)
    assert(report.failures.isEmpty,
      report.failures.map(f => s"round=${f.round} thread=${f.thread} ${f.query}: ${f.detail}")
        .mkString("\n"))
    assert(report.samples == 4L * 3 * 12)
  }
}
