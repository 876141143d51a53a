package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's self-adjudicating outlier recheck (round-13 verdict):
  * baseline-table parsing and 2×-contract outlier selection are pure
  * functions so the harness behavior that clears (or confirms) a
  * driver-run contract breach is pinned here, without a SparkSession.
  */
class BenchHarnessSpec extends AnyFunSuite {

  private val sample = Seq(
    "# BASELINE",
    "| metric | value | config | source (file:line in /root/reference) |",
    "|---|---|---|---|",
    "| End-to-end CDC latency bound | ≤ 1 s | Testcontainers | `foo.kt:31-42` |",
    "| query | sec |",
    "|---|---|",
    "| q01_filter_project | 0.29 |",
    "| q165_bounce_rate | 0.41 |",
    "| q131_peak_days | 0.15 |",
    "| q09b_approx_distinct | 0.12 |",
    "not a table line | q99_fake | 1.0 |extra",
    "| q77_sequence_pack | 1.05 | trailing-config-cell |")

  test("parseBaselineTable reads only two-cell q-name rows") {
    val m = Bench.parseBaselineTable(sample)
    assert(m == Map(
      "q01_filter_project" -> 0.29,
      "q165_bounce_rate" -> 0.41,
      "q131_peak_days" -> 0.15,
      "q09b_approx_distinct" -> 0.12))
  }

  test("the checked-in BASELINE.md parses to the full headline table") {
    val lines = scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(java.nio.file.Paths.get("BASELINE.md")))
      .asScala.toSeq
    val m = Bench.parseBaselineTable(lines)
    // Pins the format the runtime parser depends on: the measured
    // table exists, is large, and carries the round-13 flagged rows.
    assert(m.size >= 150, s"only ${m.size} baseline rows parsed")
    assert(m.contains("q02_group_agg"))
    assert(m.contains("q165_bounce_rate") && m.contains("q131_peak_days"))
    assert(m.values.forall(v => v > 0.0 && v < 60.0))
  }

  test("outliers selects exactly the >2x rows, skipping failures and unknown queries") {
    val baseline = Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0)
    val results = Seq(
      "a" -> 2.5,   // breach
      "b" -> 1.9,   // within contract (2.0x is the boundary, > required)
      "c" -> -1.0,  // failed run — never rechecked
      "d" -> 99.0)  // no baseline row — never rechecked
    assert(Bench.outliers(results, baseline) == Seq("a"))
    assert(Bench.outliers(Seq("b" -> 2.0), baseline).isEmpty,
      "exactly 2.0x does not breach (contract is 'within 2x')")
    assert(Bench.outliers(results, Map.empty).isEmpty)
  }
}
