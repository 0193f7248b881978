package graft.streaming

import org.apache.spark.api.java.Optional
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingTransitions.Ev

/** Property tests for the product-analytics state machines: for ANY
  * event script (tie-heavy timestamps, arbitrary batch splits), the
  * chunked stateful replay equals an independent driver-side model
  * written from the BATCH semantics (min-based funnel stages, distinct
  * in-horizon weeks, the strictly-before attribution window) — the
  * fuzz complement of the real-data parity specs.
  */
class FunnelFamilyPropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), p)
    assert(r.passed, r.status.toString)
  }

  /** One user's script: n events with second-granular (tie-heavy)
    * timestamps and a batch split point. */
  private case class Script(evs: List[Ev], splits: List[Int])

  private val scriptGen: Gen[Script] = for {
    n <- Gen.choose(1, 40)
    secs <- Gen.listOfN(n, Gen.choose(0L, 30L))
    types <- Gen.listOfN(n,
      Gen.oneOf("view", "click", "purchase", "other"))
    s1 <- Gen.choose(0, n)
    s2 <- Gen.choose(0, n)
  } yield {
    val evs = secs.zip(types).zipWithIndex.map { case ((sec, t), i) =>
      Ev(7L, new java.sql.Timestamp(sec * 1000), i.toLong, t)
    }.sortBy(e => (e.ts.getTime, e.event_id))
    Script(evs, List(s1 min s2, s1 max s2))
  }

  /** Drive a flatMapGroupsWithState transition function over the script
    * in chunks, carrying state between chunks like the engine does. */
  private def replay[S, O](
      script: Script,
      fn: (Long, Iterator[Ev], org.apache.spark.sql.streaming.GroupState[S])
        => Iterator[O]): Seq[O] = {
    val List(a, b) = script.splits
    val chunks =
      List(script.evs.take(a), script.evs.slice(a, b), script.evs.drop(b))
        .filter(_.nonEmpty)
    var st: Option[S] = None
    chunks.flatMap { chunk =>
      val gs = TestGroupState.create[S](
        st.map(Optional.of[S]).getOrElse(Optional.empty()),
        GroupStateTimeout.ProcessingTimeTimeout,
        1000L, Optional.empty[Long], hasTimedOut = false)
      val out = fn(7L, chunk.iterator, gs).toList
      st = if (gs.isRemoved) None
      else if (gs.isUpdated) Some(gs.get)
      else st
      out
    }
  }

  private def us(e: Ev): Long =
    Math.floorDiv(e.ts.getTime, 1000L) * 1000000L + e.ts.getNanos / 1000L

  test("funnel stages == min-based batch model for any script and split") {
    check(Prop.forAll(scriptGen) { script =>
      val out = replay[StreamingFunnel.FunnelState, StreamingFunnel.StageAdvance](
        script, StreamingFunnel.funnelUpdate(None))
      // batch-q50 semantics, written from the SQL definition: global
      // mins, not a replayed machine
      val evs = script.evs
      val tv = evs.filter(_.event_type == "view").map(us).minOption
      val tc = tv.flatMap(t =>
        evs.filter(e => e.event_type == "click" && us(e) > t).map(us).minOption)
      val tp = tc.flatMap(t =>
        evs.filter(e => e.event_type == "purchase" && us(e) > t).map(us).minOption)
      val expect =
        Seq("user") ++ tv.map(_ => "view") ++
          tc.map(_ => "click_after_view") ++ tp.map(_ => "purchase_after_click")
      out.map(_.stage).sorted == expect.sorted
    })
  }

  test("retention hits == distinct-in-horizon-weeks model for any script and split") {
    check(Prop.forAll(scriptGen) { script =>
      // re-time to day scale so week boundaries are exercised
      val dayEvs = script.evs.map(e =>
        e.copy(ts = new java.sql.Timestamp(e.ts.getTime * 86400L)))
      val dayScript = script.copy(evs = dayEvs)
      val out = replay[StreamingRetention.RetState, StreamingRetention.RetentionHit](
        dayScript, StreamingRetention.retentionUpdate(3, None))
      def wk(e: Ev): Long = Math.floorDiv(Math.floorDiv(e.ts.getTime, 86400000L), 7L)
      val weeks = dayEvs.map(wk).distinct
      val wk0 = weeks.min
      val expect = weeks.filter(w => w - wk0 <= 3).map(w => (wk0, w - wk0)).sorted
      out.map(h => (h.wk0, h.k)).sorted == expect
    })
  }

  test("WAU hits == exact coverage-union model for any day sequence (rebases included)") {
    val dayScriptGen: Gen[Script] = for {
      n <- Gen.choose(1, 30)
      // big jumps force mask rebases; repeats force dedup
      days <- Gen.listOfN(n, Gen.choose(0L, 300L))
      s1 <- Gen.choose(0, n)
      s2 <- Gen.choose(0, n)
    } yield {
      val evs = days.sorted.zipWithIndex.map { case (d, i) =>
        Ev(7L, new java.sql.Timestamp(d * 86400000L), i.toLong, "view")
      }
      Script(evs, List(s1 min s2, s1 max s2))
    }
    check(Prop.forAll(dayScriptGen) { script =>
      val out = replay[StreamingWau.WauState, StreamingWau.WauHit](
        script, StreamingWau.wauUpdate(7, None))
      val days = script.evs.map(e => Math.floorDiv(e.ts.getTime, 86400000L)).distinct
      val expect = days.flatMap(d => d until (d + 7)).distinct.sorted
      out.map(_.wday).sorted == expect
    })
  }

  test("attribution hits == strictly-before window model for any script and split") {
    check(Prop.forAll(scriptGen) { script =>
      val lookback = graft.operators.Relational.AttributionLookbackUs
      val out = replay[StreamingAttribution.Touch, StreamingAttribution.AttributionHit](
        script, StreamingAttribution.attributionUpdate(lookback, None))
      // batch-q62 semantics: for each purchase, the last marketing row
      // strictly earlier in the (us, event_id) total order
      val ordered = script.evs.sortBy(e => (us(e), e.event_id)).toIndexedSeq
      val expect = ordered.zipWithIndex.collect {
        case (e, i) if e.event_type == "purchase" =>
          val touch = ordered.take(i).reverse
            .find(t => StreamingAttribution.Marketing(t.event_type))
          touch match {
            case Some(t) if us(e) - us(t) <= lookback =>
              (t.event_type, Math.floorDiv(us(e) - us(t), 1000000L))
            case _ => ("none", 0L)
          }
      }
      out.map(h => (h.attribution, h.lag_s)) == expect
    })
  }

  test("journey paths == sliding-3-gram model for any script and split") {
    check(Prop.forAll(scriptGen) { script =>
      val out = replay[StreamingPaths.PathState, StreamingPaths.PathHit](
        script, StreamingPaths.pathUpdate(None))
      // batch-q69 semantics: consecutive type triples over the
      // (us, event_id) total order
      val types = script.evs.sortBy(e => (us(e), e.event_id)).map(_.event_type)
      val expect = types.sliding(3).filter(_.size == 3)
        .map(t => StreamingPaths.PathHit(7L, t(0), t(1), t(2))).toList
      out == expect
    })
  }
}
