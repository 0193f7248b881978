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

  test("gap-fill semantics on the gate corpus == driver-side replay") {
    // brute model: per sampled user, last value of each active day by
    // (us, event_id), carried forward over the global day spine
    val rows = graft.Tables.events(spark, sf0001)
      .filter(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.lit(Relational.GapFillUserMod)) === 0)
      .selectExpr("user_id",
        "CAST(datediff(to_date(ts), DATE '1970-01-01') AS LONG) AS day",
        "unix_micros(ts) AS us", "event_id",
        "CAST(round(value * 100) AS BIGINT) AS cents")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val close = rows.groupBy(t => (t._1, t._2)).view.mapValues(
      _.maxBy(t => (t._3, t._4))._5).toMap
    val d0 = rows.map(_._2).min; val d1 = rows.map(_._2).max
    val brute = rows.map(_._1).distinct.sorted.flatMap { u =>
      var lastOpt: Option[Long] = None
      (d0 to d1).flatMap { d =>
        val obs = close.get((u, d))
        if (obs.isDefined) lastOpt = obs
        lastOpt.map(v => (u, d, v, if (obs.isDefined) 1L else 0L))
      }
    }
    val got = Relational.q74GapFill(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(brute.nonEmpty && got == brute.toSeq,
      s"gap fill diverged: got ${got.take(3).toSeq} vs ${brute.take(3).toSeq}")
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
