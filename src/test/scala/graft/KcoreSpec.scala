package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** K-core (q70) structural evidence beyond the CTE-replay hash gate:
  * peeling is MONOTONE (the edge set only shrinks round over round),
  * the peel is real on this corpus (round 1 removes something), and
  * once a round is a no-op the fixpoint invariant holds — every
  * surviving node's in-core degree is ≥ k.
  */
class KcoreSpec extends SparkTestBase {

  private def edgeCount(rounds: Int): Long =
    Relational.kcoreEdges(spark, sf0001, rounds).count()

  test("peeling is monotone and non-trivial; a stable round implies min degree >= k") {
    val counts = (0 to Relational.KcoreRounds).map(edgeCount)
    assert(counts.sliding(2).forall { case Seq(a, b) => b <= a; case _ => true },
      s"edge counts not monotone: $counts")
    assert(counts(1) < counts(0), s"k=${Relational.KcoreK} peels nothing: $counts")
    if (counts(Relational.KcoreRounds) == counts(Relational.KcoreRounds - 1)) {
      val edges = Relational.kcoreEdges(spark, sf0001, Relational.KcoreRounds)
      val minDeg = edges.select(col("pa").as("v"))
        .unionAll(edges.select(col("pb").as("v")))
        .groupBy("v").agg(count(lit(1)).as("d"))
        .agg(min(col("d"))).head().getLong(0)
      assert(minDeg >= Relational.KcoreK,
        s"stable round but min in-core degree $minDeg < ${Relational.KcoreK}")
    }
  }
}
