package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.functions.expressions.TopKSketchAgg
import graft.functions.sketch.SpaceSaving
import graft.streaming.StreamingTopK

/** SpaceSaving guarantees pinned against exact counts, for the raw
  * sketch, the batch aggregate (with map-side partial merge), and the
  * streaming keyed-state form. The sketch's contract — any item with
  * true count > n/capacity is tracked; lower ≤ true ≤ upper — is what
  * makes it usable where the exact computation can't run.
  */
class TopKSketchSpec extends SparkTestBase {

  private val Capacity = 256
  private val K = 10

  private def exactCounts: Map[String, Long] =
    Tables.documents(spark, sf0001)
      .select(explode(split(lower(col("text")), "\\s+")).as("tok"))
      .groupBy("tok").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** `got` must be the FULL tracked set (ask for k = capacity): the
    * frequency guarantee covers tracked-ness, not top-k rank — an
    * evict-inheritor's overestimate may outrank a genuine heavy hitter. */
  private def assertGuarantees(
      got: Seq[(String, Long, Long)], exact: Map[String, Long]): Unit = {
    val n = exact.values.sum
    val mustHave = exact.filter(_._2 > n / Capacity).keySet
    val tracked = got.map(_._1).toSet
    mustHave.foreach { item =>
      assert(tracked.contains(item), s"guaranteed-frequent item $item not tracked")
    }
    got.foreach { case (item, lo, hi) =>
      val t = exact.getOrElse(item, 0L)
      assert(lo <= t && t <= hi, s"$item bounds [$lo, $hi] exclude true $t")
    }
  }

  test("raw sketch: frequency guarantee and count bounds vs exact") {
    val exact = exactCounts
    val s = new SpaceSaving(Capacity)
    Tables.documents(spark, sf0001).select("text").collect()
      .flatMap(_.getString(0).toLowerCase.split("\\s+")).foreach(s.add(_))
    assertGuarantees(s.topK(Capacity), exact)
  }

  test("merge preserves the upper bound when one side evicted an item the other tracks") {
    // capacity 2: A tracks only x; B saw x once, then evicted it for y/z
    val a = new SpaceSaving(2)
    Seq("x", "x").foreach(a.add(_))
    val b = new SpaceSaving(2)
    Seq("x", "y", "z", "y", "z").foreach(b.add(_)) // x evicted; true_B(x)=1
    val merged = a.merge(b).topK(2).map(t => t._1 -> (t._2, t._3)).toMap
    // true totals: x=3, y=2, z=3(with b's inherited error)
    merged.get("x").foreach { case (lo, hi) =>
      assert(hi >= 3, s"upper bound $hi below true count 3 for x")
      assert(lo <= 3)
    }
  }

  test("eviction tiebreak is stable across serialize/deserialize") {
    // insertion order y,x (NOT item order): an item-sorted dump would
    // restore x,y and flip the deterministic victim after a round-trip
    val a = new SpaceSaving(2)
    Seq("y", "x").foreach(a.add(_)) // both est=1, bucket order [y, x]
    val b = SpaceSaving.deserialize(a.serialized)
    a.add("z"); b.add("z") // evicts the min-bucket HEAD — must agree
    val (ta, tb) = (a.topK(2), b.topK(2))
    assert(ta == tb, s"round-trip diverged: $ta vs $tb")
    assert(!ta.map(_._1).contains("y"), s"expected y evicted first, got $ta")
  }

  test("property: guarantees hold on random weighted streams under arbitrary merge trees") {
    val rnd = new scala.util.Random(99)
    for (trial <- 1 to 5) {
      val cap = 8 + rnd.nextInt(60)
      val vocab = (0 until cap * (2 + rnd.nextInt(6))).map(i => s"w$i")
      // zipf-ish weighted stream split across 1-6 "partitions"
      val nParts = 1 + rnd.nextInt(6)
      val parts = Vector.fill(nParts)(new SpaceSaving(cap))
      val exact = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      for (_ <- 0 until 3000) {
        val item = vocab(math.min((math.pow(rnd.nextDouble(), 2) * vocab.size).toInt, vocab.size - 1))
        val w = 1L + rnd.nextInt(4)
        exact(item) += w
        parts(rnd.nextInt(nParts)).add(item, w)
      }
      // arbitrary left-leaning merge tree (shuffle merge order)
      val merged = rnd.shuffle(parts).reduce(_ merge _)
      val n = exact.values.sum
      assert(merged.n == n, s"trial $trial: merged n ${merged.n} != $n")
      assert(merged.size <= cap, s"trial $trial: tracked ${merged.size} > capacity $cap")
      val got = merged.topK(cap)
      val tracked = got.map(_._1).toSet
      exact.filter(_._2 > n / cap).keys.foreach { item =>
        assert(tracked.contains(item),
          s"trial $trial (cap=$cap): guaranteed-frequent $item untracked")
      }
      got.foreach { case (item, lo, hi) =>
        val t = exact(item)
        assert(lo <= t && t <= hi,
          s"trial $trial (cap=$cap): $item bounds [$lo, $hi] exclude true $t")
      }
      // serialize round-trip mid-merge keeps behavior identical
      val rt = SpaceSaving.deserialize(merged.serialized)
      assert(rt.topK(cap) == got, s"trial $trial: round-trip changed topK")
    }
  }

  test("a zero-weight add refreshes the item's eviction position") {
    // add(item, 0) leaves the estimate alone but re-appends the item
    // within its bucket — the touched item outlives its untouched
    // bucket-mate under eviction (pre-Stream-Summary behavior, pinned)
    val s = new SpaceSaving(2)
    s.add("a"); s.add("b") // est-1 bucket order [a, b]
    s.add("a", 0L)         // refresh: order becomes [b, a]
    s.add("c")             // evicts the bucket head — now b, not a
    val kept = s.topK(2).map(_._1).toSet
    assert(kept == Set("a", "c"), s"expected refresh to save 'a', got $kept")
  }

  test("batch aggregate: partial+final merged sketch keeps the guarantees") {
    val exact = exactCounts
    val got = Tables.documents(spark, sf0001)
      .select(explode(split(lower(col("text")), "\\s+")).as("tok"))
      .repartition(8) // force real partial sketches + merge
      .agg(TopKSketchAgg(col("tok"), Capacity, Capacity).as("top"))
      .selectExpr("inline(top)")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assertGuarantees(got, exact)
    val plan = Tables.documents(spark, sf0001)
      .select(explode(split(lower(col("text")), "\\s+")).as("tok"))
      .agg(TopKSketchAgg(col("tok"), Capacity, K).as("top"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_topksketchagg"), s"no map-side partials:\n$plan")
  }

  test("streaming keyed-state sketch across micro-batches keeps the guarantees") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val exact = exactCounts
    val toks = Tables.documents(spark, sf0001).select("text").collect()
      .flatMap(_.getString(0).toLowerCase.split("\\s+"))

    val stream = MemoryStream[String]
    val out = StreamingTopK.topK(stream.toDS(), groups = 4, capacity = Capacity, k = Capacity)
    val query = out.writeStream.format("memory").queryName("topk_stream")
      .outputMode("append").start()
    try {
      val (a, b) = toks.splitAt(toks.length / 2)
      stream.addData(a.toIndexedSeq); query.processAllAvailable()
      stream.addData(b.toIndexedSeq); query.processAllAvailable()
      val snaps = spark.table("topk_stream")
        .as[StreamingTopK.Snapshot].collect().toSeq
      // full tracked union (not a top-K truncation): the guarantee covers
      // tracked-ness; each group sketches a DISJOINT hash-slice, so the
      // per-slice guarantee is strictly stronger than one global sketch
      val merged = StreamingTopK.mergedLatest(snaps, Capacity * 4)
      assertGuarantees(merged, exact)
    } finally query.stop()
  }

  test("idleTimeout: idle group's sketch is evicted and restarts cold") {
    import scala.concurrent.duration._
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    val out = StreamingTopK.topK(stream.toDS(), groups = 1, capacity = 8, k = 8,
      idleTimeout = Some(15.seconds))
    val query = streaming.SourceKit.Sinks.toMemory(out, "topk_ttl",
      triggerInterval = Some("100 milliseconds"))
    try {
      streaming.SourceKit.Script.empty[String]
        .addElem("x")
        .addGap(20.seconds) // > idleTimeout: the group's sketch is dropped
        .addElem("x")
        .playByCount(stream, spark, "topk_ttl")
      val snaps = spark.table("topk_ttl")
        .as[StreamingTopK.Snapshot].collect().toSeq.sortBy(_.batch)
      // count restarts at 1 (COLD sketch — un-evicted state would show 2)
      // but the version advances to 2: the counter survives eviction so
      // mergedLatest can still rank the restarted snapshot as latest
      assert(snaps.map(sn => (sn.batch, sn.item, sn.count_hi)) ==
        Seq((1L, "x", 1L), (2L, "x", 1L)), s"got $snaps")
      // and the merged view reflects the post-eviction sketch, with no
      // double-count from the equal-version collision a reset would cause
      assert(StreamingTopK.mergedLatest(snaps, 8) == Seq(("x", 1L, 1L)))
      val rows = streaming.StateProbe.awaitStateRows(query, _ == 1L)
      assert(rows == 1, s"expected 1 state row, got $rows")
    } finally query.stop()
  }
}
