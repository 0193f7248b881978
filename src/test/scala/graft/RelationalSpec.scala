package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Smoke + semantics checks for the batch relational surface at sf0.001.
  * Cross-engine value equality is covered by the DuckDB oracle gate
  * (tools/selfcheck.py locally, driver Verify per round); these specs pin
  * the semantics that the oracle can't see (plan shape, invariants).
  */
class RelationalSpec extends SparkTestBase {

  test("every registered query runs non-empty on sf0.001 with its declared columns") {
    Relational.all.foreach { case (name, fn) =>
      val df = fn(spark, sf0001)
      val n = df.count()
      assert(n > 0, s"$name returned no rows")
      assert(df.columns.nonEmpty, s"$name has no columns")
    }
  }

  test("oracle SQL exists for every relational query") {
    val missing = Relational.all.keySet -- operators.RelationalOracles.all.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("q1 groups are complete and counts add up to table size") {
    val df = Relational.q1Agg(spark, sf0001)
    val total = df.agg(sum("count_order")).head().getLong(0)
    val expected = Tables.lineitem(spark, sf0001).count()
    assert(total == expected)
  }

  test("q14 TTL sessionization: session restarts begin from the event's own value") {
    val df = Relational.q14MapWithStateTtl(spark, sf0001).cache()
    // each (user, session) first row has running_value == that event's value
    val firsts = df
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id", "session_id").orderBy("event_id")))
      .filter(col("rn") === 1)
    val ev = Tables.events(spark, sf0001)
      .select(col("event_id"), col("value").cast("decimal(18,2)").as("v"))
    val bad = firsts.join(ev, "event_id")
      .filter(col("running_value") =!= col("v")).count()
    assert(bad == 0, s"$bad session-first rows whose running sum != own value")
    // sessions actually split (eviction fires on this data)
    val maxSess = df.agg(max("session_id")).head().getLong(0)
    assert(maxSess > 1, "TTL never split a session — eviction untested")
    df.unpersist()
  }

  test("q13 count windows only emit complete windows of exactly 2") {
    val df = Relational.q13CountWindow(spark, sf0001)
    assert(df.filter(col("n") =!= 2).count() == 0)
  }

  test("q21 native session windows produce the same sessions as q14's gap model") {
    val q14Sessions = Relational.q14MapWithStateTtl(spark, sf0001)
      .select("user_id", "session_id").distinct().count()
    val q21Sessions = Relational.q21SessionWindow(spark, sf0001).count()
    assert(q14Sessions == q21Sessions,
      s"gap-model sessions $q14Sessions != session_window sessions $q21Sessions")
  }

  test("q3 plan broadcasts dimension tables and pushes filters to scan") {
    val plan = Relational.q3JoinAgg(spark, sf0001).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "expected broadcast joins for dims")
  }

  test("q2 pushes predicates into the parquet scan") {
    val plan = Relational.q2FilterProject(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), "no pushed filters in scan")
    assert(plan.contains("l_discount"), "discount predicate not pushed")
  }

  test("q29 window-function invariants: chain consistency and cume_dist bounds") {
    val rows = Relational.q29WindowFuncs(spark, sf0001).collect()
    val byCust = rows.groupBy(_.getLong(0))
    byCust.foreach { case (_, rs) =>
      // rows come back ordered by (custkey, orderkey); re-derive window order
      val inWin = rs.sortBy(r => (r.getLong(0), r.getLong(1)))
      // every row's next_order must name an order of the same customer; the
      // last row in window order has next_order null
      val cd = rs.map(_.getDouble(6)).max
      assert(cd == 1.0, s"max cume_dist $cd != 1.0")
      val quartiles = rs.map(_.getLong(4)).distinct.sorted
      assert(quartiles.head >= 1 && quartiles.last <= 4)
      assert(inWin.nonEmpty)
    }
    assert(rows.count(_.isNullAt(2)) == byCust.size, "exactly one null prev per customer")
  }

  test("q30 full outer join keeps unmatched rows from both sides") {
    val rows = Relational.q30FullOuter(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.exists { case (_, n, b) => n > 0 && b == 0 }, "no left-only rows")
    assert(rows.exists { case (_, n, b) => n == 0 && b == 1 }, "no right-only rows")
    assert(rows.forall { case (_, n, b) => n > 0 || b == 1 }, "phantom null-null row")
  }

  test("q31 distinct counts are bounded by group size") {
    Relational.q31CountDistinct(spark, sf0001).collect().foreach { r =>
      assert(r.getLong(1) <= r.getLong(3), "n_custs > n_orders")
      assert(r.getLong(2) <= 12L, "n_months > 12")
    }
  }

  test("sortedPercentiles matches the built-in exact percentile at random fractions") {
    // q38 pins two fractions bit-level against DuckDB; this fuzzes the
    // rank arithmetic (pos, floor/ceil rows, frac) across arbitrary
    // fractions against Spark's own exact percentile() — same
    // interpolation semantics, independent single-reducer implementation
    val rnd = new scala.util.Random(5)
    val qs = Seq.tabulate(6)(i => (s"q$i", rnd.nextDouble()))
    val df = graft.Tables.lineitem(spark, sf0001)
      .select(col("l_returnflag"), col("l_quantity").cast("double").as("v"))
    val got = Relational.sortedPercentiles(df, "l_returnflag", "v", qs)
      .collect().map(r => r.getString(0) -> qs.indices.map(i => r.getDouble(i + 1))).toMap
    val aggs = qs.map { case (n, q) => expr(s"percentile(v, $q)").as(n) }
    val expected = df.groupBy("l_returnflag").agg(aggs.head, aggs.tail: _*)
      .collect().map(r => r.getString(0) -> qs.indices.map(i => r.getDouble(i + 1))).toMap
    assert(got.keySet == expected.keySet)
    for (k <- got.keySet; i <- qs.indices) {
      val (g, e) = (got(k)(i), expected(k)(i))
      // identical position/frac semantics; allow last-ulp formula drift
      assert(math.abs(g - e) <= math.max(1e-9, math.ulp(e) * 4),
        s"group $k fraction ${qs(i)._2}: sorted=$g builtin=$e")
    }
  }

  test("bandPercentiles == sortedPercentiles bit-for-bit at random fractions") {
    // the sort-free band-refinement path must reproduce the sort-based
    // path EXACTLY (same lo/hi rows, same interpolation sequence) —
    // including at q=0/q=1 band edges and on a duplicate-heavy column
    val rnd = new scala.util.Random(11)
    val qs = Seq(("q0", 0.0), ("q1", 1.0)) ++
      Seq.tabulate(5)(i => (s"r$i", rnd.nextDouble()))
    for (vcol <- Seq("l_quantity", "l_discount")) { // l_discount: few distinct values
      val df = graft.Tables.lineitem(spark, sf0001)
        .select(col("l_returnflag"), col(vcol).cast("double").as("v"))
      val sorted = Relational.sortedPercentiles(df, "l_returnflag", "v", qs)
        .collect().map(r => r.getString(0) -> qs.indices.map(i => r.getDouble(i + 1))).toMap
      val band = Relational.bandPercentiles(df, "l_returnflag", "v", qs)
        .collect().map(r => r.getString(0) -> qs.indices.map(i => r.getDouble(i + 1))).toMap
      assert(band.keySet == sorted.keySet)
      for (k <- band.keySet; i <- qs.indices)
        assert(band(k)(i) == sorted(k)(i),
          s"$vcol group $k fraction ${qs(i)._2}: band=${band(k)(i)} sorted=${sorted(k)(i)}")
    }
  }

  test("band-miss guard: tail fractions either throw loudly or produce exact values — never NaN") {
    // p01/p99 on small groups need the band margin (3/accuracy) to span
    // a rank interval (1/(n−1)); at the default accuracy this corpus's
    // 300-row groups missed and used to flow NaN thresholds silently.
    // The contract now: a miss THROWS the loud guard; success means
    // non-NaN values. Either outcome is acceptable per-corpus — silent
    // NaN never is.
    val fine = Relational.columnWinsorize(spark, sf0001).collect()
    assert(fine.nonEmpty && fine.forall(r =>
      !r.getDouble(5).isNaN && !r.getDouble(6).isNaN),
      "winsorize (accuracy 500) produced NaN thresholds")
    val o = graft.Tables.orders(spark, sf0001)
      .select(col("o_orderpriority").as("grp"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .localCheckpoint()
    def messages(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ::: messages(t.getCause)
    scala.util.Try {
      Relational.bandPercentilesMulti(o, "grp",
        Seq("cents" -> Seq(("p01", 0.01), ("p99", 0.99))), accuracy = 10000)
        .collect()
    } match {
      case scala.util.Failure(e) =>
        assert(messages(e).exists(_.contains("missed its target rank")),
          s"band miss failed with the wrong error: $e")
      case scala.util.Success(rows) =>
        assert(rows.forall(r => !r.getDouble(1).isNaN && !r.getDouble(2).isNaN),
          "default-accuracy band silently flowed NaN past the guard")
    }
  }

  test("q43 z-order: bit-exact decode and multi-dim locality beat a 1-d sort") {
    val rows = Relational.q43Zorder(spark, sf0001).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // decode: de-interleaving z recovers (u16, t16) exactly
    rows.foreach { case (u, t, z) =>
      var du = 0L; var dt = 0L
      (0 until 16).foreach { i =>
        du |= ((z >> (2 * i)) & 1L) << i
        dt |= ((z >> (2 * i + 1)) & 1L) << i
      }
      assert(du == u && dt == t, s"decode($z) = ($du,$dt) != ($u,$t)")
    }
    // locality: split the z-sorted rows into files; each file's (u,t)
    // bounding rectangle should cover a small fraction of both ranges
    // on average — the property min/max pruning exploits. A t16-sorted
    // layout has near-total u16 coverage per file; z-order must do
    // better on u16 while keeping t16 bounded.
    val files = rows.sortBy(_._3).grouped(math.max(rows.length / 16, 1)).toSeq
    def meanCoverage(fs: Seq[Array[(Long, Long, Long)]], f: ((Long, Long, Long)) => Long) = {
      val span = rows.map(f).max - rows.map(f).min + 1
      fs.map(g => (g.map(f).max - g.map(f).min + 1).toDouble / span).sum / fs.size
    }
    val tSorted = rows.sortBy(_._2).grouped(math.max(rows.length / 16, 1)).toSeq
    val zU = meanCoverage(files, _._1)
    val tU = meanCoverage(tSorted, _._1)
    assert(zU < tU * 0.8,
      s"z-order u16 coverage $zU not better than t-sorted layout's $tU")
  }

  test("q44 scd2: versions chain gaplessly, exactly one current per key, all changes kept") {
    val rows = Relational.q44Scd2(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getString(4), r.getLong(5)))
    val nOrders = graft.Tables.orders(spark, sf0001).count()
    assert(rows.length == nOrders, "every change row must open a version")
    rows.groupBy(_._1).foreach { case (cust, vs) =>
      // the SCD2 contract: sorted versions chain valid_from -> valid_to
      // without gaps, only the last is open/current
      val sorted = vs.sortBy(v => (v._4, v._2))
      sorted.init.zip(sorted.tail).foreach { case (a, b) =>
        assert(a._5 == b._4,
          s"customer $cust: version ${a._2} closes at ${a._5} but next opens at ${b._4}")
        assert(a._6 == 0L, s"customer $cust: non-final version ${a._2} marked current")
      }
      assert(sorted.last._5 == "9999-12-31" && sorted.last._6 == 1L,
        s"customer $cust: final version not open-ended current")
      assert(vs.count(_._6 == 1L) == 1,
        s"customer $cust: ${vs.count(_._6 == 1L)} current versions")
    }
  }

  test("q45 PIT join == naive inequality-join reference (inclusive same-day reads)") {
    val dim = graft.Tables.orders(spark, sf0001)
      .select(col("o_custkey").as("d_cust"),
        datediff(col("o_orderdate"), lit("1970-01-01")).cast("long").as("d_days"),
        col("o_orderkey").as("d_okey"), col("o_orderstatus"))
      .groupBy("d_cust", "d_days")
      .agg(max_by(col("o_orderstatus"), col("d_okey")).as("d_status"))
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic table —
    // a per-row fact id keeps the reference from collapsing real facts
    val facts = graft.Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"),
        datediff(col("l_shipdate"), lit("1970-01-01")).cast("long").as("ship_days"),
        (col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("decimal(18,4)").as("rev"))
      .join(graft.Tables.orders(spark, sf0001)
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("fid", monotonically_increasing_id())
    // reference: every (fact, dim-version) pair with d_days <= ship_days,
    // then per-fact argmax on d_days — the O(facts·versions) formulation
    // the as-of exec replaces
    val ref = facts
      .join(dim, col("o_custkey") === col("d_cust")
        && col("d_days") <= col("ship_days"))
      .groupBy("fid")
      .agg(first(col("rev")).as("rev"),
        max_by(col("d_status"), col("d_days")).as("d_status"))
      .groupBy("d_status")
      .agg(count(lit(1)).as("n_items"),
        sum(col("rev")).cast("decimal(18,4)").cast("double").as("revenue"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val got = Relational.q45PitJoin(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == ref, s"PIT diverges from the naive reference:\n$got\nvs\n$ref")
  }

  test("q55 DOULION estimate within 10% of the exact triangle count at sf0.001") {
    import org.apache.spark.sql.functions._
    val row = operators.Relational.q55Triangles(spark, sf0001).collect().head
    val sampled = row.getAs[Long]("n_triangles_sampled")
    val mod = operators.Relational.TriangleSampleMod
    val est = sampled.toDouble * mod * mod * mod
    // exact count on the FULL sf0.001 graph via the id-ordered 3-way
    // join — the oracle's scheme, independent of the gate's machinery
    val edges = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .as("a")
      .join(Tables.lineitem(spark, sf0001)
        .select(col("l_orderkey"), col("l_partkey")).distinct().as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
      .distinct()
      .localCheckpoint()
    val exact = edges.as("e1")
      .join(edges.as("e2"), col("e1.pb") === col("e2.pa"))
      .join(edges.as("e3"),
        col("e3.pa") === col("e1.pa") && col("e3.pb") === col("e2.pb"),
        "left_semi")
      .count()
    assert(exact > 0)
    val relErr = math.abs(est - exact) / exact.toDouble
    assert(relErr < 0.10, s"estimate $est vs exact $exact (err $relErr)")
  }

  test("triangle machinery fuzz: random graphs == brute-force count") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    (1 to 4).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 40
      val edges = (for {
        a <- 0 until n; b <- (a + 1) until n
        if rnd.nextDouble() < 0.15
      } yield (a.toLong, b.toLong)).toVector
      val adj = edges.toSet
      val brute = (for {
        a <- 0 until n; b <- (a + 1) until n; c <- (b + 1) until n
        if adj((a, b)) && adj((b, c)) && adj((a, c))
      } yield 1).size.toLong
      val wedges = {
        val deg = edges.flatMap(e => Seq(e._1, e._2))
          .groupBy(identity).view.mapValues(_.size.toLong)
        deg.values.map(d => d * (d - 1) / 2).sum
      }
      val got = operators.Relational.triangleStats(
          edges.toDF("pa", "pb")).collect().head
      assert(got.getAs[Long]("n_edges_sampled") == edges.size.toLong)
      assert(got.getAs[Long]("n_wedges_sampled") == wedges,
        s"seed $seed wedges")
      assert(got.getAs[Long]("n_triangles_sampled") == brute,
        s"seed $seed: engine ${got.getAs[Long]("n_triangles_sampled")} vs brute $brute")
    }
  }

  test("q42 upsert: deletes drop, inserts appear, updates win, rest unchanged") {
    val base = graft.Tables.orders(spark, sf0001)
      .select("o_orderkey", "o_custkey", "o_orderstatus").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val rows = Relational.q42Upsert(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2), r.getDouble(3)))
    val got = rows.toMap
    // insert offset = max key rounded up to the next billion (derived,
    // not fixed — a constant collides with real keys at SF >= ~150)
    val off = (base.keys.max / 1000000000L + 1L) * 1000000000L
    // keys are unique in the merged output (the MERGE contract)
    assert(got.size == rows.length)
    base.keys.foreach { k =>
      if (k % 13 == 0 && k % 10 != 0)
        assert(!got.contains(k), s"deleted key $k survived")
      else {
        assert(got.contains(k), s"base key $k lost")
        if (k % 10 == 0) assert(got(k)._2 == "U", s"update lost on $k")
        else assert(got(k)._2 == base(k)._2, s"status changed on untouched $k")
      }
      if (k % 17 == 0)
        assert(got.contains(k + off) && got(k + off)._2 == "N",
          s"insert missing for $k")
    }
  }
}
