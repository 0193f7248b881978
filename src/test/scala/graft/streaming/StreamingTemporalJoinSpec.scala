package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase
import StreamingTemporalJoin.{dim, fact, Enriched, Env}

/** Streaming temporal (as-of) join: inclusive PIT matching, cross-batch
  * version state, deterministic in-batch ordering, and watermark-driven
  * version retention.
  *
  * Functional tests run with a FAR watermark delay (wm pinned at 0) so
  * no row is late-filtered; the retention path is pinned by unit tests
  * on the pure `retained` helper plus a live-query check that the
  * still-effective version survives eviction (sub-watermark facts that
  * could observe eviction from output are dropped by Spark's late
  * filter before the stateful exec — by design).
  */
class StreamingTemporalJoinSpec extends SparkTestBase {

  private def run(batches: Seq[Seq[Env]], delay: String = "7 days"): Seq[Enriched] = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Env]
    val out = StreamingTemporalJoin(
      stream.toDS().withWatermark("ts", delay))
    val name = s"temporal_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => stream.addData(b); q.processAllAvailable() }
      spark.table(name).as[Enriched].collect().toSeq
    } finally {
      q.stop(); spark.catalog.dropTempView(name)
    }
  }

  test("facts match the latest version at-or-before their time, across batches") {
    val got = run(Seq(
      Seq(dim(1L, 1000L, "v1"), dim(1L, 3000L, "v2")),
      Seq(fact(1L, 999L, 10L), fact(1L, 1000L, 11L),
        fact(1L, 2999L, 12L), fact(1L, 3000L, 13L), fact(1L, 9000L, 14L))))
      .map(e => e.value -> ((e.payload, e.dim_t))).toMap
    assert(got(10L) == ((None, -1L)), s"pre-history fact matched: $got")
    assert(got(11L) == ((Some("v1"), 1000L)), "inclusive boundary broken")
    assert(got(12L) == ((Some("v1"), 1000L)))
    assert(got(13L) == ((Some("v2"), 3000L)), "inclusive boundary broken at v2")
    assert(got(14L) == ((Some("v2"), 3000L)))
  }

  test("same-batch dim+fact at equal timestamp enrich inclusively (dims sort first)") {
    val got = run(Seq(
      Seq(fact(5L, 2000L, 20L), dim(5L, 2000L, "d"))))
    assert(got.map(e => (e.value, e.payload)) == Seq((20L, Some("d"))))
  }

  test("equal-t dim re-statement replaces in place; keys stay independent; out-of-order dim lands mid-history") {
    val got = run(Seq(
      Seq(dim(1L, 1000L, "a1"), dim(2L, 1000L, "b1"), dim(1L, 5000L, "a3")),
      Seq(dim(1L, 1000L, "a2"), // re-statement of the same valid-from
        dim(1L, 3000L, "amid")), // arrives after a3 but is valid earlier
      Seq(fact(1L, 1500L, 1L), fact(2L, 1500L, 2L),
        fact(1L, 4000L, 3L), fact(1L, 6000L, 4L))))
      .map(e => e.value -> e.payload).toMap
    assert(got == Map(1L -> Some("a2"), 2L -> Some("b1"),
      3L -> Some("amid"), 4L -> Some("a3")))
  }

  test("== driver-side as-of model on a randomized two-batch feed") {
    val rnd = new scala.util.Random(42)
    val keys = (1L to 5L)
    val dims = keys.flatMap { k =>
      rnd.shuffle((1 to 50).toVector).take(6).zipWithIndex
        .map { case (slot, i) => (k, 1000L * slot, s"k${k}v$i") }
    }
    val facts = keys.flatMap { k =>
      (0 until 40).map(i => (k, 1000L * (rnd.nextInt(60) + 1), k * 1000 + i))
    }
    val all = dims.map(d => Env(d._1, new java.sql.Timestamp(d._2), true, d._3, 0L)) ++
      facts.map(f => Env(f._1, new java.sql.Timestamp(f._2), false, null, f._3))
    // event-time order with the operator's own tiebreak: a same-t
    // dim/fact pair split across the batch boundary still processes the
    // dim in the earlier batch
    val ordered = all.sortBy(e => (e.ts.getTime, !e.is_dim, e.value,
      Option(e.payload).getOrElse("")))
    val (b1, b2) = ordered.splitAt(ordered.length / 2)
    val hist = dims.groupBy(_._1).view
      .mapValues(_.map(d => (d._2, d._3)).sortBy(_._1)).toMap
    val expected = facts.map { case (k, t, v) =>
      val eff = hist.getOrElse(k, Seq.empty).filter(_._1 <= t)
      if (eff.isEmpty) (v, None, -1L)
      else (v, Some(eff.last._2), eff.last._1)
    }.toSet
    val got = run(Seq(b1, b2)).map(e => (e.value, e.payload, e.dim_t)).toSet
    assert(got == expected,
      s"diff: ${(got -- expected).take(3)} vs ${(expected -- got).take(3)}")
  }

  test("hot key: 50k facts + 200 versions for ONE key in one micro-batch") {
    // pins the per-key-per-batch buffering bound (the slice sorts on the
    // heap) and the binary-search matching under a deep version history
    val versions = (1 to 200).map(i => dim(9L, i * 1000L, s"v$i"))
    val facts5 = (1 to 50000).map(i => fact(9L, i.toLong, i.toLong))
    val got = run(Seq(versions ++ facts5))
    assert(got.size == 50000)
    // spot-exact: the fact at t=i picks version floor(i/1000)
    val byVal = got.map(e => e.value -> e).toMap
    assert(byVal(1500L).payload == Some("v1"))
    assert(byVal(49999L).payload == Some("v49"))
    assert(byVal(50000L).payload == Some("v50"))
    val none = got.filter(_.payload.isEmpty)
    // facts with t < 1000 (i % 220000 < 1000) have no effective version
    assert(none.size == got.count(_.ts.getTime < 1000L) && none.nonEmpty)
  }

  test("retained: evicts below-watermark versions except the still-effective one") {
    import StreamingTemporalJoin.retained
    val vs = Vector((1000L, "v1"), (2000L, "v2"), (50000L, "v3"))
    assert(retained(vs, 0L) == vs, "wm 0 must not evict")
    assert(retained(vs, 999L) == vs, "wm before history must not evict")
    assert(retained(vs, 1999L) == vs, "v1 still effective at wm 1999")
    assert(retained(vs, 2000L) == vs.drop(1), "v2 effective at wm 2000, v1 dead")
    assert(retained(vs, 49999L) == vs.drop(1))
    assert(retained(vs, 50000L) == vs.drop(2), "only v3 effective at wm 50000")
    assert(retained(vs, 999999L) == vs.drop(2), "latest version never evicted")
    assert(retained(Vector.empty, 5L) == Vector.empty)
  }

  test("still-effective version survives live eviction (wm advanced far past it)") {
    // batch 1 sets history [v1@1s, v2@2s] and pushes the watermark to
    // ~100s via a far fact; batch 2's invocation starts at wm=100s, so
    // retention after it keeps only v2 (floor of wm); batch 3's fact
    // must still enrich from the post-eviction state
    val got = run(Seq(
      Seq(dim(1L, 1000L, "v1"), dim(1L, 2000L, "v2"), fact(1L, 100000L, 29L)),
      Seq(fact(1L, 100500L, 30L)),
      Seq(fact(1L, 101000L, 31L))), delay = "0 seconds")
      .map(e => e.value -> ((e.payload, e.dim_t))).toMap
    assert(got(29L) == ((Some("v2"), 2000L)))
    assert(got(30L) == ((Some("v2"), 2000L)), s"restored state wrong: $got")
    assert(got(31L) == ((Some("v2"), 2000L)), s"post-eviction state wrong: $got")
  }
}
