package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Relational
import graft.plans.AsOfJoin

/** The native as-of join operator (custom LogicalPlan + Strategy +
  * merge SparkPlan): semantics pinned against a tiny hand-computed case,
  * the window-function formulation on real data, and the physical plan
  * shape (AsOfJoinExec present, exactly one shuffle per side).
  */
class AsOfJoinSpec extends SparkTestBase {

  test("strictly-earlier semantics on a hand-built case, incl. ties and no-match") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, 10L, "p1"), // matches right t=5 (t=10 excluded: strict)
      (1L, 3L, "p0"),  // no prior right row -> dropped
      (2L, 50L, "p2"), // key 2 has no right rows at all -> dropped
      (1L, 20L, "p3")  // matches t=12
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, 5L), (1L, 10L), (1L, 12L)
    ).toDF("rk", "rt")
    val got = AsOfJoin.asof(left, right, "k", "rk", "t", "rt")
      .select("tag", "rt").as[(String, Long)].collect().toMap
    assert(got == Map("p1" -> 5L, "p3" -> 12L), s"got $got")
  }

  test("forward direction: smallest strictly-later right; shared across lefts") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, 10L, "p1"), // next right after 10 is 12
      (1L, 3L, "p0"),  // next right after 3 is 5
      (1L, 5L, "pEq"), // rt=5 excluded (strict), matches 12
      (1L, 20L, "pNone"), // nothing after 20
      (2L, 1L, "p2")   // key 2 has no rights
    ).toDF("k", "t", "tag")
    val right = Seq((1L, 5L), (1L, 12L)).toDF("rk", "rt")
    val got = AsOfJoin.asof(left, right, "k", "rk", "t", "rt", AsOfJoin.Forward)
      .select("tag", "rt").as[(String, Long)].collect().toMap
    assert(got == Map("p0" -> 5L, "p1" -> 12L, "pEq" -> 12L), s"got $got")
  }

  test("LEFT OUTER keeps unmatched lefts with null right side (both directions)") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, 10L, "p1"), // matches 5 backward, 12 forward
      (1L, 3L, "p0"),  // no prior right -> null backward; 5 forward
      (2L, 50L, "p2"), // key 2 has no rights -> null both ways
      (1L, 20L, "p3")  // matches 12 backward; nothing later -> null forward
    ).toDF("k", "t", "tag")
    val right = Seq((1L, 5L), (1L, 12L)).toDF("rk", "rt")
    def run(dir: AsOfJoin.Direction) =
      AsOfJoin.asof(left, right, "k", "rk", "t", "rt", dir,
          joinType = AsOfJoin.LeftOuter)
        .select("tag", "rt").collect()
        .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(run(AsOfJoin.Backward) == Map(
      "p1" -> Some(5L), "p0" -> None, "p2" -> None, "p3" -> Some(12L)))
    assert(run(AsOfJoin.Forward) == Map(
      "p1" -> Some(12L), "p0" -> Some(5L), "p2" -> None, "p3" -> None))
  }

  test("tolerance bounds the match; out-of-tolerance behaves as no-match") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, 10L, "near"),  // candidate rt=8, delta 2 <= 3 -> match
      (1L, 50L, "far"),   // candidate rt=12, delta 38 > 3 -> no match
      (1L, 13L, "edge")   // candidate rt=12, delta 1 <= 3 -> match
    ).toDF("k", "t", "tag")
    val right = Seq((1L, 8L), (1L, 12L)).toDF("rk", "rt")
    val inner = AsOfJoin.asof(left, right, "k", "rk", "t", "rt",
        within = Some(3L))
      .select("tag", "rt").as[(String, Long)].collect().toMap
    assert(inner == Map("near" -> 8L, "edge" -> 12L), s"got $inner")
    // LEFT OUTER + tolerance: 'far' surfaces with a null right
    val outer = AsOfJoin.asof(left, right, "k", "rk", "t", "rt",
        joinType = AsOfJoin.LeftOuter, within = Some(3L))
      .select("tag", "rt").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(outer == Map("near" -> Some(8L), "far" -> None, "edge" -> Some(12L)))
    // forward tolerance: next-later right within the bound only
    val fwd = AsOfJoin.asof(left, right, "k", "rk", "t", "rt",
        AsOfJoin.Forward, within = Some(3L))
      .select("tag", "rt").as[(String, Long)].collect().toMap
    // near(10): next later is 12, delta 2 <= 3; far(50)/edge(13): none later in bound
    assert(fwd == Map("near" -> 12L), s"got $fwd")
  }

  test("LEFT OUTER preserves null-key/time left rows (DuckDB ASOF LEFT JOIN shape)") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (Some(1L), Some(10L), "match"),
      (Option.empty[Long], Some(10L), "nullkey"),
      (Some(1L), Option.empty[Long], "nulltime")
    ).toDF("k", "t", "tag")
    val right = Seq((1L, 5L)).toDF("rk", "rt")
    val got = AsOfJoin.asof(left, right, "k", "rk", "t", "rt",
        joinType = AsOfJoin.LeftOuter)
      .select("tag", "rt").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    // inner drops the null rows; LEFT OUTER must keep them, null-filled
    assert(got == Map(
      "match" -> Some(5L), "nullkey" -> None, "nulltime" -> None), s"got $got")
  }

  test("tolerance is overflow-safe against sentinel times") {
    val s = spark
    import s.implicits._
    // candidate at Long.MinValue: lt - candTime overflows a signed long;
    // an unsigned comparison must reject the match, not admit it
    val left = Seq((1L, 100L, "p")).toDF("k", "t", "tag")
    val right = Seq((1L, Long.MinValue)).toDF("rk", "rt")
    val bounded = AsOfJoin.asof(left, right, "k", "rk", "t", "rt",
        within = Some(3600L))
    assert(bounded.count() == 0, "overflowed delta admitted a bogus match")
    // without a tolerance the sentinel still matches (plain backward as-of)
    val unbounded = AsOfJoin.asof(left, right, "k", "rk", "t", "rt")
    assert(unbounded.count() == 1)
  }

  test("NULL keys and times never match (and never corrupt the merge)") {
    val s = spark
    import s.implicits._
    // negative keys after a null would read as key-decreasing (null→0)
    // without the null filter — this data catches both the spurious-match
    // and the broken-invariant failure modes
    val left = Seq(
      (Some(-5L), Some(10L), "neg"),
      (Some(0L), Some(10L), "zero"),
      (Option.empty[Long], Some(10L), "nullkey"),
      (Some(1L), Option.empty[Long], "nulltime")
    ).toDF("k", "t", "tag")
    val right = Seq(
      (Some(-5L), Some(1L)),
      (Some(0L), Some(2L)),
      (Option.empty[Long], Some(3L)),
      (Some(0L), Option.empty[Long])
    ).toDF("rk", "rt")
    val got = AsOfJoin.asof(left, right, "k", "rk", "t", "rt")
      .select("tag", "rt").as[(String, Long)].collect().toMap
    assert(got == Map("neg" -> 1L, "zero" -> 2L), s"got $got")
  }

  test("empty right side yields empty result; empty left side too") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 10L)).toDF("k", "t")
    val emptyR = Seq.empty[(Long, Long)].toDF("rk", "rt")
    assert(AsOfJoin.asof(left, emptyR, "k", "rk", "t", "rt").count() == 0)
    val emptyL = Seq.empty[(Long, Long)].toDF("k", "t")
    val right = Seq((1L, 5L)).toDF("rk", "rt")
    assert(AsOfJoin.asof(emptyL, right, "k", "rk", "t", "rt").count() == 0)
  }

  test("many keys across partitions: per-key candidates never leak across keys") {
    val s = spark
    import s.implicits._
    // 200 keys, left at t=100 and t=5; right rows at t=1, t=50, t=99 per
    // key — every key's t=100 purchase must match ITS OWN t=99 row
    val left = (0L until 200L).flatMap(k => Seq((k, 100L), (k, 5L))).toDF("k", "t")
    val right = (0L until 200L).flatMap(k => Seq((k, 1L), (k, 50L), (k, 99L))).toDF("rk", "rt")
    val got = AsOfJoin.asof(left, right, "k", "rk", "t", "rt")
      .select("k", "t", "rt").as[(Long, Long, Long)].collect().toSet
    val expected = (0L until 200L).flatMap(k => Seq((k, 100L, 99L), (k, 5L, 1L))).toSet
    assert(got == expected, s"diff: ${(expected -- got).take(3)} missing, ${(got -- expected).take(3)} extra")
  }

  test("native as-of == window-function formulation on real events (views before purchases)") {
    val ev = Tables.events(spark, sf0001)
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("event_id"), col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val w = Window.partitionBy("user_id").orderBy("us")
      .rangeBetween(Window.unboundedPreceding, -1)
    val windowed = ev
      .withColumn("last_view_us",
        last(when(col("event_type") === "view", col("us")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase" && col("last_view_us").isNotNull)
      .select(col("event_id"), col("last_view_us"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val native = Relational.q32AsofNative(spark, sf0001)
      .select(col("event_id"), col("view_us"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == windowed,
      s"${native.size} native vs ${windowed.size} windowed; diff: " +
        windowed.collectFirst { case (k, v) if native.get(k) != Some(v) => (k, v, native.get(k)) })
  }

  test("optimizer rule pushes left-only filters below the as-of join; right filters stay") {
    val ev = Tables.events(spark, sf0001)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), unix_micros(col("ts")).as("view_us"))
    val joined = AsOfJoin.asof(p, v, "user_id", "v_user", "us", "view_us")

    // left-side filter: must sit BELOW AsOfJoinPlan after optimization
    val leftFiltered = joined.filter(col("event_id") % 2 === 0)
    val opt = leftFiltered.queryExecution.optimizedPlan.toString
    val joinLine = opt.linesIterator.indexWhere(_.contains("AsOfJoin"))
    val filterLine = opt.linesIterator.indexWhere(l => l.contains("Filter") && l.contains("event_id"))
    assert(joinLine >= 0 && filterLine > joinLine,
      s"left filter not pushed below the join:\n$opt")
    // and the filtered result equals filter-before-join semantics
    val expected = AsOfJoin.asof(
        p.filter(col("event_id") % 2 === 0), v, "user_id", "v_user", "us", "view_us")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(leftFiltered.collect().map(_.getLong(0)).sorted.toSeq == expected)

    // right-side filter: must NOT be pushed (it would change candidates)
    val rightFiltered = joined.filter(col("view_us") % 2 === 0)
    val opt2 = rightFiltered.queryExecution.optimizedPlan.toString
    val joinLine2 = opt2.linesIterator.indexWhere(_.contains("AsOfJoin"))
    val filterLine2 = opt2.linesIterator.indexWhere(l => l.contains("Filter") && l.contains("view_us"))
    assert(filterLine2 >= 0 && filterLine2 < joinLine2,
      s"right filter was pushed below the join (unsound):\n$opt2")

    // LEFT OUTER: left-side pushdown is equally sound (preserved side)
    val outer = AsOfJoin.asof(p, v, "user_id", "v_user", "us", "view_us",
      joinType = AsOfJoin.LeftOuter)
    val outerFiltered = outer.filter(col("event_id") % 2 === 0)
    val opt3 = outerFiltered.queryExecution.optimizedPlan.toString
    val joinLine3 = opt3.linesIterator.indexWhere(_.contains("AsOfJoin"))
    val filterLine3 = opt3.linesIterator.indexWhere(l => l.contains("Filter") && l.contains("event_id"))
    assert(joinLine3 >= 0 && filterLine3 > joinLine3,
      s"left filter not pushed below the LEFT OUTER join:\n$opt3")
    val outerExpected = AsOfJoin.asof(
        p.filter(col("event_id") % 2 === 0), v, "user_id", "v_user", "us", "view_us",
        joinType = AsOfJoin.LeftOuter)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(outerFiltered.collect().map(_.getLong(0)).sorted.toSeq == outerExpected)
  }

  test("column pruning reaches both scans through the as-of join") {
    val ev = Tables.events(spark, sf0001)
    // deliberately fat sides: props and event_type come along
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        col("props"), col("event_type"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), unix_micros(col("ts")).as("view_us"),
        col("props").as("v_props"))
    val slim = AsOfJoin.asof(p, v, "user_id", "v_user", "us", "view_us")
      .select("event_id", "view_us")
    slim.collect()
    val plan = slim.queryExecution.executedPlan.toString
    // neither props column may survive to either scan's ReadSchema
    val reads = plan.linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
    assert(!reads.contains("props"), s"props not pruned from scans:\n$plan")
    // and values are unaffected by pruning
    val expected = Relational.q32AsofNative(spark, sf0001)
      .select(col("event_id"), col("view_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(slim.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == expected)
  }

  test("multi-key as-of: equality on (long, string) keys before the time match") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, "a", 10L, "l1"), // matches (1,a) rt=5, NOT (1,b) rt=9
      (1L, "b", 10L, "l2"), // matches (1,b) rt=9
      (1L, "c", 10L, "l3"), // no (1,c) rights -> dropped under Inner
      (2L, "a", 10L, "l4")  // matches (2,a) rt=7
    ).toDF("k1", "k2", "t", "tag")
    val right = Seq(
      (1L, "a", 5L), (1L, "b", 9L), (2L, "a", 7L), (2L, "b", 8L)
    ).toDF("rk1", "rk2", "rt")
    val inner = AsOfJoin.asofMulti(left, right,
        Seq("k1", "k2"), Seq("rk1", "rk2"), "t", "rt")
      .select("tag", "rt").as[(String, Long)].collect().toMap
    assert(inner == Map("l1" -> 5L, "l2" -> 9L, "l4" -> 7L), s"got $inner")
    // LEFT OUTER keeps l3 null-filled; a null in EITHER key slot never matches
    val leftWithNull = left.union(Seq(
      (Option.empty[Long], Some("a"), Some(10L), "nullk1"),
      (Some(1L), Option.empty[String], Some(10L), "nullk2")
    ).toDF("k1", "k2", "t", "tag"))
    val outer = AsOfJoin.asofMulti(leftWithNull, right,
        Seq("k1", "k2"), Seq("rk1", "rk2"), "t", "rt",
        joinType = AsOfJoin.LeftOuter)
      .select("tag", "rt").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(outer == Map(
      "l1" -> Some(5L), "l2" -> Some(9L), "l3" -> None, "l4" -> Some(7L),
      "nullk1" -> None, "nullk2" -> None), s"got $outer")
  }

  test("multi-key as-of == window formulation on real events (prev same-type event)") {
    val ev = Tables.events(spark, sf0001)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    // rangeBetween(..., -1) on us excludes same-timestamp rows — the
    // same strictness as the as-of `>` comparator
    val w = Window.partitionBy("user_id", "event_type").orderBy("us")
      .rangeBetween(Window.unboundedPreceding, -1)
    val windowed = ev.withColumn("prev_us", max("us").over(w))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    val native = Relational.q37AsofMultiKey(spark, sf0001)
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    assert(native == windowed,
      s"${native.size} native vs ${windowed.size} windowed; first diff: " +
        windowed.collectFirst { case (k, v) if native.get(k) != Some(v) => (k, v, native.get(k)) })
  }

  test("property: all mode combos match a driver-side brute force on random data") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 2) {
      // few keys (forced collisions), coarse times (forced ties), plus
      // null keys/times sprinkled on the left
      val nL = 150 + rnd.nextInt(100)
      val nR = 150 + rnd.nextInt(100)
      val leftRows = (0 until nL).map { id =>
        val k = if (rnd.nextInt(20) == 0) None else Some(rnd.nextInt(7).toLong)
        val t = if (rnd.nextInt(20) == 0) None else Some(rnd.nextInt(50).toLong)
        (id.toLong, k, t)
      }
      val rightRows = (0 until nR).map { _ =>
        (rnd.nextInt(7).toLong, rnd.nextInt(50).toLong)
      }
      val left = leftRows.toDF("id", "k", "t")
      val right = rightRows.toDF("rk", "rt")
      for {
        dir <- Seq(AsOfJoin.Backward, AsOfJoin.Forward)
        kind <- Seq(AsOfJoin.Inner, AsOfJoin.LeftOuter)
        tol <- Seq(None, Some(5L))
      } {
        // brute force: the matched right TIME per left id (the matched
        // row among same-(key,time) ties is unspecified; its time isn't)
        val expected: Map[Long, Option[Long]] = leftRows.flatMap {
          case (id, kOpt, tOpt) =>
            val m = for {
              k <- kOpt; t <- tOpt
              cands = rightRows.collect {
                case (rk, rt) if rk == k &&
                  (if (dir == AsOfJoin.Backward) rt < t else rt > t) &&
                  tol.forall(w => math.abs(t - rt) <= w) => rt
              }
              best <- if (cands.isEmpty) None
                      else Some(if (dir == AsOfJoin.Backward) cands.max else cands.min)
            } yield best
            if (m.isEmpty && kind == AsOfJoin.Inner) None else Some(id -> m)
        }.toMap
        val got = AsOfJoin.asof(left, right, "k", "rk", "t", "rt", dir, kind, tol)
          .select("id", "rt").collect()
          .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
          .toMap
        assert(got == expected,
          s"trial $trial $dir/$kind/tol=$tol: ${got.size} got vs ${expected.size} expected; " +
            s"first diff: ${expected.collectFirst {
              case (k, v) if got.get(k) != Some(v) => (k, v, got.get(k))
            }}")
      }
    }
  }

  test("property: multi-key as-of matches brute force across dir × kind × tolerance") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 2) {
      // two key columns (long + string, few values → forced collisions),
      // coarse times (forced ties), nulls sprinkled on the left
      val nL = 120 + rnd.nextInt(80)
      val nR = 120 + rnd.nextInt(80)
      val leftRows = (0 until nL).map { id =>
        val k1 = if (rnd.nextInt(25) == 0) None else Some(rnd.nextInt(4).toLong)
        val k2 = if (rnd.nextInt(25) == 0) None else Some("g" + rnd.nextInt(3))
        val t = if (rnd.nextInt(25) == 0) None else Some(rnd.nextInt(40).toLong)
        (id.toLong, k1, k2, t)
      }
      val rightRows = (0 until nR).map { _ =>
        (rnd.nextInt(4).toLong, "g" + rnd.nextInt(3), rnd.nextInt(40).toLong)
      }
      val left = leftRows.toDF("id", "k1", "k2", "t")
      val right = rightRows.toDF("rk1", "rk2", "rt")
      for {
        dir <- Seq(AsOfJoin.Backward, AsOfJoin.Forward)
        kind <- Seq(AsOfJoin.Inner, AsOfJoin.LeftOuter)
        tol <- Seq(None, Some(4L))
      } {
        val expected: Map[Long, Option[Long]] = leftRows.flatMap {
          case (id, k1o, k2o, tOpt) =>
            val m = for {
              k1 <- k1o; k2 <- k2o; t <- tOpt
              cands = rightRows.collect {
                case (rk1, rk2, rt) if rk1 == k1 && rk2 == k2 &&
                  (if (dir == AsOfJoin.Backward) rt < t else rt > t) &&
                  tol.forall(w => math.abs(t - rt) <= w) => rt
              }
              best <- if (cands.isEmpty) None
                      else Some(if (dir == AsOfJoin.Backward) cands.max else cands.min)
            } yield best
            if (m.isEmpty && kind == AsOfJoin.Inner) None else Some(id -> m)
        }.toMap
        val got = AsOfJoin.asofMulti(left, right,
            Seq("k1", "k2"), Seq("rk1", "rk2"), "t", "rt", dir, kind, tol)
          .select("id", "rt").collect()
          .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
          .toMap
        assert(got == expected,
          s"trial $trial $dir/$kind/tol=$tol: first diff ${expected.collectFirst {
            case (k, v) if got.get(k) != Some(v) => (k, v, got.get(k))
          }}")
      }
    }
  }

  test("skew recipe: time-sliced as-of equals plain as-of on a hot key") {
    val s = spark
    import s.implicits._
    // one pathological key holds ~95% of both sides — the straggler
    // case AQE's OptimizeSkewedJoin does NOT repair for a custom exec
    // (it only rewrites SMJ/SHJ). The documented recipe (SCALE.md):
    // salt the as-of key with a time slice, run the per-slice as-of,
    // and resolve slice-boundary matches with a per-(key, slice)
    // carried maximum — the hot key then spreads across slices.
    val rnd = new scala.util.Random(7)
    val hotL = (0 until 20000).map(i => (i.toLong, 0L, rnd.nextInt(100000).toLong))
    val coldL = (20000 until 20500).map(i => (i.toLong, 1L + rnd.nextInt(3), rnd.nextInt(100000).toLong))
    val left = (hotL ++ coldL).toDF("id", "k", "t")
    val right = ((0 until 20000).map(_ => (0L, rnd.nextInt(100000).toLong)) ++
      (0 until 500).map(_ => (1L + rnd.nextInt(3), rnd.nextInt(100000).toLong)))
      .toDF("rk", "rt")
    def times(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.select("id", "rt").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plain = times(AsOfJoin.asof(left, right, "k", "rk", "t", "rt"))
    val W = 10000L
    val lb = left.withColumn("ls", floor(col("t") / W).cast("long"))
    val rb = right.withColumn("rs", floor(col("rt") / W).cast("long"))
    // in-slice match: the salted join — (key, slice) spreads the hot key
    val inSlice = AsOfJoin.asofMulti(lb, rb,
        Seq("k", "ls"), Seq("rk", "rs"), "t", "rt",
        AsOfJoin.Backward, AsOfJoin.LeftOuter)
      .select(col("id").as("iid"), col("rt").as("in_rt"))
    // carried match: latest right time strictly before each slice start,
    // via a running max over the TINY per-(key, slice) summary (keys ×
    // slices rows) — itself an as-of on the slice index
    val runMax = rb.groupBy(col("rk").as("ck"), col("rs").as("cs"))
      .agg(max("rt").as("smax"))
      .withColumn("best", max("smax").over(
        Window.partitionBy("ck").orderBy("cs")))
      .select("ck", "cs", "best")
    val carried = AsOfJoin.asofMulti(lb.select("id", "k", "ls"), runMax,
        Seq("k"), Seq("ck"), "ls", "cs",
        AsOfJoin.Backward, AsOfJoin.LeftOuter)
      .select(col("id").as("cid"), col("best").as("carried_rt"))
    val sliced = inSlice.join(carried, col("iid") === col("cid"))
      .select(col("iid").as("id"),
        coalesce(col("in_rt"), col("carried_rt")).as("rt"))
      .filter(col("rt").isNotNull)
    assert(times(sliced) == plain, "time-sliced as-of diverged from plain as-of")
    // and the salt genuinely spreads the hot key across the cluster
    val hotSlices = lb.filter(col("k") === 0L).select("ls").distinct().count()
    assert(hotSlices >= 10L, s"hot key only landed in $hotSlices slices")
  }

  test("physical plan: AsOfJoinExec with one hash exchange per side") {
    val df = Relational.q32AsofNative(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // SparkPlan renders the node name with the Exec suffix stripped
    assert(plan.contains("AsOfJoin "), s"native exec not planned:\n$plan")
    val finalPlan = plan.split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r.findAllIn(finalPlan).size
    assert(exchanges == 2, s"expected 2 hash exchanges (one per side), got $exchanges:\n$plan")
  }
}
