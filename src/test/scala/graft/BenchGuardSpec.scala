package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards on the bench harness's adjudication machinery (maps and
  * knobs only — the timing paths themselves are exercised by the
  * documented dry runs in BASELINE.md r19: the 1-second-budget shed
  * run, the SIGTERM partial-artifact run, and the forced-retry run). */
class BenchGuardSpec extends AnyFunSuite {

  test("anchor maps are positive and non-overlapping") {
    (Bench.StreamHealthyAnchorSec ++ Bench.BatchHealthyAnchorSec).foreach {
      case (n, a) => assert(a > 0, s"non-positive anchor for $n")
    }
    val overlap =
      Bench.StreamHealthyAnchorSec.keySet intersect Bench.BatchHealthyAnchorSec.keySet
    assert(overlap.isEmpty, s"lines anchored in both segments: $overlap")
  }

  test("anchor-by-default (r19): the formerly-unanchored cheap batch lines are pinned") {
    // the r18 incident lines plus representatives of the q8/q15 family
    // VERDICT r18 item 3 names — q1_agg=28.48 s entered the loaded
    // working-tree artifact unretried exactly because these were bare
    val mustHave = Seq("q1_agg", "q26_cube", "q15_rollup", "q9_running_sum",
      "q13_count_window", "q14_mapwithstate_ttl", "q10_rank_topn")
    mustHave.foreach(n =>
      assert(Bench.BatchHealthyAnchorSec.contains(n), s"missing batch anchor: $n"))
    assert(Bench.StreamHealthyAnchorSec.contains("bpe_encode_deep"))
  }

  test("rocksdb twin rotation: every demotable twin is anchored and the keeper rotates within the set") {
    Bench.RocksTwinRotation.foreach { n =>
      assert(Bench.StreamHealthyAnchorSec.contains(n), s"unanchored rotation twin: $n")
    }
    assert(Bench.RocksTwinRotation.distinct.size == Bench.RocksTwinRotation.size)
    assert(Bench.RocksTwinRotation.contains(Bench.rotatingRocksKeeper))
  }

  test("budget knobs default sane: soft deadline >> a clean full suite, retry cap bounded") {
    assert(Bench.timeBudgetSec >= 600.0,
      "soft deadline must comfortably exceed a clean full-suite run")
    assert(Bench.retryBudgetSec > 0.0 && Bench.retryBudgetSec <= 120.0,
      "retry spend cap must be a small fraction of the suite")
    assert(Bench.retryFactor > 1.0)
  }

  test("retry-sample transparency (r20): every sample renders, min-bias auditable") {
    // the artifact must carry the FULL sample list of a retried line —
    // the pre-retry min first, then each retry attempt, failed attempts
    // as -1 — so a reader can recompute the min and see what the
    // keep-the-min estimator discarded
    val json = Bench.renderRetrySamples(Seq(
      "q55_triangles" -> Seq(5.1234, 3.4, -1.0),
      "q61_pagerank" -> Seq(6.0, 4.25)))
    assert(json ==
      """{"q55_triangles":[5.123,3.4,-1.0],"q61_pagerank":[6.0,4.25]}""")
    assert(Bench.renderRetrySamples(Seq.empty) == "{}")
  }

  test("host probe: bounded cost, sane readings, never throws") {
    // the probe adjudicates every artifact, so its own contract needs a
    // pin: finishes well inside its documented ~1 s ceiling, wakeup
    // latency is a positive sub-10ms number (688 us was the worst
    // contended reading observed; 10 ms would mean the probe itself is
    // broken), and steal% is a percentage or the -1 unavailable marker
    val t0 = System.nanoTime()
    val (wakeupUs, stealPct) = Bench.hostProbe()
    val elapsed = (System.nanoTime() - t0) / 1e9
    assert(elapsed < 5.0, s"probe took $elapsed s — cap broken")
    assert(wakeupUs > 0 && wakeupUs < 10000, s"wakeup_us out of range: $wakeupUs")
    assert(stealPct == -1.0 || (stealPct >= 0 && stealPct <= 100),
      s"steal_pct out of range: $stealPct")
  }
}
