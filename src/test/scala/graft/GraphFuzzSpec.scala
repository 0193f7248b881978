package graft

import graft.operators.Relational

/** Random-graph fuzz for the two round-14 graph operators, against
  * driver-side brute-force models — the structural evidence beyond the
  * CTE-replay hash gates (the triangleStats fuzz discipline):
  * `neighborJaccard` must produce EXACTLY the brute-force pair set
  * (counts, degrees, and integer-ppm ratios), and `bfsReach` must
  * produce exactly the brute-force BFS layering from the max-degree
  * seed.
  */
class GraphFuzzSpec extends SparkTestBase {

  private def randomEdges(seed: Int, n: Int, p: Double): Vector[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    (for {
      a <- 0 until n; b <- (a + 1) until n
      if rnd.nextDouble() < p
    } yield (a.toLong, b.toLong)).toVector
  }

  private def adjacency(edges: Vector[(Long, Long)]): Map[Long, Set[Long]] =
    (edges.flatMap { case (a, b) => Seq(a -> b, b -> a) })
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("neighborJaccard fuzz: random graphs == brute-force pair set") {
    val s = spark
    import s.implicits._
    (1 to 4).foreach { seed =>
      val edges = randomEdges(seed, 35, 0.18)
      val adj = adjacency(edges)
      val topNodes = 12
      val top = adj.keys.toSeq.sortBy(v => (-adj(v).size, v)).take(topNodes).toSet
      val brute = (for {
        a <- top.toSeq; b <- top.toSeq if a < b
        c = (adj(a) & adj(b)).size.toLong if c > 0
        da = adj(a).size.toLong; db = adj(b).size.toLong
      } yield (a, b, c, da, db, (1000000L * c) / (da + db - c))).toSet
      val got = Relational.neighborJaccard(
          edges.toDF("pa", "pb").localCheckpoint(), topNodes)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toSet
      assert(brute.nonEmpty && got == brute,
        s"seed $seed: ${got.size} engine pairs vs ${brute.size} brute " +
          s"(diff ${(got diff brute).take(3)} / ${(brute diff got).take(3)})")
    }
  }

  test("bfsReach fuzz: random graphs == brute-force BFS layering") {
    val s = spark
    import s.implicits._
    (1 to 4).foreach { seed =>
      // sparse enough that the BFS needs several hops
      val edges = randomEdges(seed, 60, 0.04)
      val adj = adjacency(edges)
      val start = adj.keys.toSeq.sortBy(v => (-adj(v).size, v)).head
      var frontier = Set(start)
      var reached = Set(start)
      val layers = Seq.newBuilder[(Long, Long, Long)]
      layers += ((0L, 1L, start))
      var dist = 1L
      while (frontier.nonEmpty && dist <= Relational.BfsRounds) {
        val next = frontier.flatMap(v => adj.getOrElse(v, Set.empty)) -- reached
        if (next.nonEmpty) layers += ((dist, next.size.toLong, next.sum))
        reached ++= next
        frontier = next
        dist += 1
      }
      val brute = layers.result()
      val got = Relational.bfsReach(edges.toDF("pa", "pb").localCheckpoint())
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(brute.length > 2, s"seed $seed: degenerate graph, only $brute")
      assert(got == brute, s"seed $seed: engine $got vs brute $brute")
    }
  }
}
