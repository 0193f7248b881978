package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** PageRank (q61) structural evidence beyond the CTE-replay hash gate:
  * the iteration CONVERGES (per-round L1 delta shrinks monotonically)
  * and the fixed-point arithmetic conserves rank mass up to the
  * documented floor losses.
  */
class PagerankSpec extends SparkTestBase {

  private def rankMap(iters: Int): Map[Long, Long] =
    Relational.pagerankRanks(spark, sf0001, iters).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("per-round L1 delta shrinks monotonically (convergence direction)") {
    val byIter = (1 to Relational.PagerankIters).map(rankMap)
    val deltas = byIter.sliding(2).map { case Seq(a, b) =>
      a.keys.map(k => math.abs(b(k) - a(k))).sum
    }.toSeq
    assert(deltas.nonEmpty && deltas.sliding(2).forall {
      case Seq(x, y) => y < x
      case _ => true
    }, s"L1 deltas not shrinking: $deltas")
    // and it is actually moving mass in round 1 (not a fixed point of
    // a degenerate graph)
    assert(deltas.head > 0L)
  }

  test("rank mass is conserved up to floor losses") {
    val ranks = rankMap(Relational.PagerankIters)
    val n = ranks.size.toLong
    val total = ranks.values.sum
    // each round floors at the contribution (≤1 per edge), the dangling
    // share (≤1 per node), the damped term and the base (≤2 per node) —
    // mass only leaks DOWN, bounded per round by ~(edges + 3n) units on
    // a 1e12 grid
    assert(total <= Relational.PagerankScale)
    val maxLoss = Relational.PagerankIters.toLong *
      (ranks.size.toLong * 8L + 100000L)
    assert(Relational.PagerankScale - total < maxLoss,
      s"mass leak too large: total=$total of ${Relational.PagerankScale}")
  }
}
