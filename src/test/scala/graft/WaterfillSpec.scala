package graft

import graft.functions.TextAnalysis

/** Pins the water-filling allocation beyond the cross-engine hash gate:
  * the level must be FEASIBLE (admitted mass fits the budget) and
  * MAXIMAL (level+1 would overflow), small sources must be whole, and
  * capped sources must sit exactly at the level. */
class WaterfillSpec extends SparkTestBase {

  private def check(dir: String): Unit = {
    val rows = TextAnalysis.tokenBudgetWaterfill(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val level = rows.head._5
    assert(rows.forall(_._5 == level))
    val budget = rows.map(_._2).sum / 2
    val admitted = rows.map(_._3).sum
    assert(admitted <= budget, s"$dir: admitted $admitted > budget $budget")
    val atLevelPlusOne = rows.map { case (_, t, _, _, _) => math.min(t, level + 1) }.sum
    assert(atLevelPlusOne > budget || rows.forall { case (_, t, a, _, _) => a == t },
      s"$dir: level $level not maximal (level+1 still fits $atLevelPlusOne <= $budget)")
    rows.foreach { case (src, t, a, ppm, _) =>
      assert(a == math.min(t, level), s"$dir $src: admitted $a != min($t, $level)")
      assert(ppm == a * 1000000L / t, s"$dir $src: rate_ppm")
    }
  }

  test("waterfill level is feasible and maximal at all three SFs") {
    check(sf0001)
    check("/root/testdata/sf0.01")
    check("/root/testdata/sf0.1")
  }
}
