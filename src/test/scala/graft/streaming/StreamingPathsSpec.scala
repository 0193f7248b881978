package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.Relational
import graft.streaming.StreamingTransitions.Ev

/** Streaming 3-gram journey paths == batch q69 when fed in order:
  * aggregating the emitted hits with the same count/distinct/order
  * reproduces the batch top-paths result row for row, including the
  * cross-batch chaining through the two-string suffix state.
  */
class StreamingPathsSpec extends SparkTestBase {

  test("cross-batch path hits aggregate == batch q69 top paths") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = graft.Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[Ev].collect()
      .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
    val stream = MemoryStream[Ev]
    val out = StreamingPaths.paths(stream.toDS())
    val q = SourceKit.Sinks.toMemory(out.toDF(), "paths_out")
    try {
      val (b1, b2) = rows.toIndexedSeq.splitAt(rows.length / 2)
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      val streamed = spark.table("paths_out")
        .groupBy("e1", "e2", "e3")
        .agg(count(lit(1)).as("n_paths"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("n_paths").desc, col("e1").asc, col("e2").asc,
          col("e3").asc)
        .limit(20)
        .collect().map(_.toSeq).toSeq
      val batch = Relational.q69PathTopk(spark, sf0001)
        .collect().map(_.toSeq).toSeq
      assert(batch.nonEmpty && streamed == batch,
        s"streamed paths diverged: ${streamed.take(3)} vs ${batch.take(3)}")
    } finally q.stop()
  }

  test("pathsAgg latest snapshots == batch q69 counts; KMV users exact below k, bounded above") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = graft.Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[Ev].collect()
      .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
    val k = 64 // small enough that hot paths exceed it — both regimes covered
    val stream = MemoryStream[Ev]
    val out = StreamingPaths.pathsAgg(stream.toDS(), k)
    val q = SourceKit.Sinks.toMemory(out.toDF(), "paths_agg_out")
    try {
      val (b1, b2) = rows.toIndexedSeq.splitAt(rows.length / 2)
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      // latest snapshot per path (max batch version)
      val latest = spark.table("paths_agg_out")
        .groupBy("e1", "e2", "e3")
        .agg(max(struct(col("batch"), col("n_hits"), col("n_vals"),
          col("est_users"))).as("s"))
        .select(col("e1"), col("e2"), col("e3"), col("s.n_hits"),
          col("s.n_vals"), col("s.est_users"))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
          (r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
      val batch = graft.operators.Relational.q69PathTopk(spark, sf0001)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
          (r.getLong(3), r.getLong(4)))
      assert(batch.nonEmpty)
      batch.foreach { case (path, (nPaths, nUsers)) =>
        val (hits, nVals, est) = latest.getOrElse(path,
          fail(s"path $path missing from streamed aggregate"))
        assert(hits == nPaths, s"$path hit count $hits != batch $nPaths")
        // gate corpus paths stay below k distinct users (max ~11 at
        // sf0.001), so the k-min set IS the user set: estimate EXACT
        assert(nVals < k && est == nUsers.toDouble,
          s"$path est $est (n_vals=$nVals) != exact $nUsers below k")
      }
    } finally q.stop()
  }

  test("pathsAgg estimation regime: KMV estimate within 3·SE of thousands of users") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val k = 256
    val st = TestGroupState.create[(Long, Long, Array[Long])](
      Optional.empty(), GroupStateTimeout.NoTimeout, 1000L,
      Optional.empty[Long], hasTimedOut = false)
    val path = ("view", "click", "purchase")
    // 3000 distinct users across two batches with an overlapping 500:
    // exact distinct = 3000, hits = 3500 — accumulation and dedup both
    // exercised; sketch regime since 3000 >> k
    def hits(users: Range) = users.iterator.map(u =>
      StreamingPaths.PathHit(u.toLong, path._1, path._2, path._3))
    val out1 = StreamingPaths.pathAggUpdate(k)(path, hits(1 to 2000), st).toSeq
    assert(out1.map(_.n_hits) == Seq(2000L))
    val out2 = StreamingPaths.pathAggUpdate(k)(
      path, hits(1501 to 3000), st).toSeq
    val snap = out2.head
    assert(snap.batch == 2L && snap.n_hits == 3500L && snap.n_vals == k.toLong)
    val se = 1.0 / math.sqrt(k - 2.0)
    assert(math.abs(snap.est_users - 3000.0) / 3000.0 <= 3 * se,
      s"KMV estimate ${snap.est_users} off exact 3000 beyond 3·SE ($se)")
    // order-insensitivity: the k-min set is a pure function of the SET
    // of users seen — a permuted, differently-batched feed lands on the
    // identical sketch columns
    val st2 = TestGroupState.create[(Long, Long, Array[Long])](
      Optional.empty(), GroupStateTimeout.NoTimeout, 1000L,
      Optional.empty[Long], hasTimedOut = false)
    val shuffled = new scala.util.Random(14).shuffle((1 to 3000).toList)
    val (s1, s2) = shuffled.splitAt(700)
    StreamingPaths.pathAggUpdate(k)(path,
      s1.iterator.map(u => StreamingPaths.PathHit(u.toLong, path._1, path._2, path._3)), st2)
    val snap2 = StreamingPaths.pathAggUpdate(k)(path,
      s2.iterator.map(u => StreamingPaths.PathHit(u.toLong, path._1, path._2, path._3)), st2)
      .toSeq.head
    assert((snap2.n_vals, snap2.kth_val, snap2.est_users) ==
      ((snap.n_vals, snap.kth_val, snap.est_users)),
      "sketch columns depend on arrival order/batching")
  }

  test("exactly max(0, n-2) hits per user; suffix chains across batches") {
    import scala.concurrent.duration._
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    def mkState(st: Option[StreamingPaths.PathState]) =
      TestGroupState.create[StreamingPaths.PathState](
        st.map(Optional.of[StreamingPaths.PathState]).getOrElse(Optional.empty()),
        GroupStateTimeout.ProcessingTimeTimeout,
        1000L, Optional.empty[Long], hasTimedOut = false)
    def ev(tMs: Long, id: Long, t: String) =
      Ev(5L, new java.sql.Timestamp(tMs), id, t)
    val st = mkState(None)
    // first batch: three events -> exactly one 3-gram
    val out1 = StreamingPaths.pathUpdate(Some(500.millis))(
      5L, Iterator(ev(0, 1, "view"), ev(1, 2, "click"), ev(2, 3, "purchase")),
      st).toSeq
    assert(out1 == Seq(StreamingPaths.PathHit(5L, "view", "click", "purchase")))
    // second batch: one event -> one more 3-gram chained through state
    val out2 = StreamingPaths.pathUpdate(Some(500.millis))(
      5L, Iterator(ev(3, 4, "view")), st).toSeq
    assert(out2 == Seq(StreamingPaths.PathHit(5L, "click", "purchase", "view")))
    // fewer than 3 events ever seen -> no hits
    val fresh = mkState(None)
    assert(StreamingPaths.pathUpdate(Some(500.millis))(
      5L, Iterator(ev(0, 1, "view"), ev(1, 2, "click")), fresh).isEmpty)
  }
}
