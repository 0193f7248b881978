package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Pins the round-13 scale guards: the basket-size ceiling fails
  * LOUDLY on a pathological basket (VERDICT r12 item 8), and the
  * iterative-graph broadcast hints DEGRADE to shuffled joins above the
  * node/edge threshold instead of OOMing (item 2), computing identical
  * results either way.
  */
class ScaleGuardSpec extends SparkTestBase {

  test("oversized basket fails loudly at the guard; bounded baskets pass through") {
    import spark.implicits._
    val ok = Seq((1L, (1L to 7L).toArray)).toDF("id", "parts0")
      .select(Relational.guardedBasket(col("parts0")).as("parts"))
      .collect()
    assert(ok.head.getSeq[Long](0) == (1L to 7L))
    val big = Seq((1L, (0L until (Relational.MaxBasketParts + 1L)).toArray))
      .toDF("id", "parts0")
    val ex = intercept[Throwable] {
      big.select(Relational.guardedBasket(col("parts0")).as("parts")).collect()
    }
    def messages(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ::: messages(t.getCause)
    assert(messages(ex).exists(_.contains("MaxBasketParts")),
      s"expected the loud basket guard, got: $ex")
  }

  test("broadcast row budget is byte-aware: wider frames get fewer rows") {
    import spark.implicits._
    val narrow = Seq((1L, 2L)).toDF("pa", "pb") // the graph-frame shape
    val wide = Seq((1L, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 10.0,
      11.0, 12.0, 13.0, 14.0, 15.0, 16.0, 17.0, 18.0, 19.0))
      .toDF("k", "c1", "c2", "c3", "c4", "c5", "c6", "c7", "c8", "c9", "c10",
        "c11", "c12", "c13", "c14", "c15", "c16", "c17", "c18", "c19")
    val nb = Relational.graphBroadcastRowBudget(narrow)
    val wb = Relational.graphBroadcastRowBudget(wide)
    // the 2-long frame keeps the former ~50M-row regime; a 20-column
    // frame's budget shrinks with its width instead of silently reusing
    // the narrow constant
    assert(nb > 30000000L, s"narrow budget regressed: $nb")
    assert(wb < nb / 5, s"wide frame kept a narrow budget: narrow=$nb wide=$wb")
  }

  test("pagerank computes identical ranks with the rank broadcast disabled") {
    def ranks(threshold: Long): Map[Long, Long] =
      Relational.pagerankRanks(spark, sf0001, 2, broadcastMaxNodes = threshold)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // threshold 0 forces every round onto the shuffled both-sides join —
    // the path a 100-TB node set takes
    assert(ranks(Long.MaxValue) == ranks(0L))
  }

  test("triangle close degrades to a shuffled semi join above the edge threshold") {
    import spark.implicits._
    // seeded random graph, pa < pb distinct — same shape as the fuzz spec
    val rnd = new scala.util.Random(7)
    val edges = (1 to 400).map { _ =>
      val a = rnd.nextInt(40).toLong; val b = rnd.nextInt(40).toLong
      (math.min(a, b), math.max(a, b))
    }.filter { case (a, b) => a != b }.distinct
      .toDF("pa", "pb").localCheckpoint()
    val broadcastForm = Relational.triangleStats(edges).collect().head
    // disable Catalyst/AQE auto-broadcast so the fallback's UNHINTED
    // join plans the way it would at a scale where broadcast is
    // impossible — then pin both the plan shape and the numbers
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val fb = Relational.triangleStats(edges, closeBroadcastMaxEdges = 0L)
      val fallbackForm = fb.collect().head
      assert(fallbackForm == broadcastForm)
      val plan = fb.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"fallback still broadcasts:\n$plan")
      assert(plan.contains("LeftSemi"), s"closing semi join missing:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
