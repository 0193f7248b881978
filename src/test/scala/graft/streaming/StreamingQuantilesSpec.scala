package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase
import graft.streaming.SourceKit.Sinks

class StreamingQuantilesSpec extends SparkTestBase {

  private def nearestRank(sorted: IndexedSeq[Double], q: Double): Double =
    sorted((math.max(1L, math.ceil(q * sorted.size).toLong) - 1).toInt)

  test("exact-mode snapshots match nearest-rank truth of each group's cumulative feed") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val groups = 4
    val fractions = Seq(0.25, 0.5, 0.9)
    val rnd = new scala.util.Random(5)
    val all = IndexedSeq.fill(600)(rnd.nextDouble() * 100)
    val (b1, b2) = all.splitAt(300)
    def grp(v: Double) = math.floorMod(java.lang.Double.hashCode(v), groups)

    val stream = MemoryStream[Double]
    val out = StreamingQuantiles.quantiles(
      stream.toDS(), groups, capacity = 4096, fractions)
    val query = Sinks.toMemory(out, "sq_trace")
    try {
      stream.addData(b1); query.processAllAvailable()
      stream.addData(b2); query.processAllAvailable()
      val snaps = Sinks.collected[StreamingQuantiles.QSnapshot](spark, "sq_trace")

      // batch 1 snapshots: per group, quantiles of its batch-1 values;
      // batch 2 snapshots (version 2): quantiles of the cumulative feed
      for ((batchRows, version) <- Seq((b1, 1L), (all, 2L))) {
        val byGroup = batchRows.groupBy(grp)
        byGroup.foreach { case (g, vs) =>
          val snap = snaps.find(sn => sn.group == g && sn.batch == version)
            .getOrElse(fail(s"no snapshot for group $g version $version"))
          assert(snap.n == vs.size)
          val sorted = vs.sorted
          fractions.zipWithIndex.foreach { case (q, i) =>
            assert(snap.quantiles(i) == nearestRank(sorted, q),
              s"group $g v$version q=$q")
          }
        }
      }
      // versions are monotonic per group, one snapshot per (group, batch)
      assert(snaps.groupBy(sn => (sn.group, sn.batch)).forall(_._2.size == 1))
    } finally query.stop()
  }
}
