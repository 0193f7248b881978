package graft

import org.apache.spark.sql.functions._

import graft.functions.Profiling

/** Accuracy and structure of the HLL NDV sketch (`approx_ndv`). The
  * driver gate hash-checks the integer register summary cross-engine;
  * these specs pin what the gate can't: the derived estimate's accuracy
  * (standard error 1.04/√m ≈ 4.6% at m=512) and register-merge
  * structure.
  */
class HllSketchSpec extends SparkTestBase {

  test("estimate within 15% of exact on the documents corpus") {
    val rows = Profiling.approxNdv(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = Profiling.hllEstimate(r.getLong(1), r.getLong(3).toDouble)
      val exact = r.getLong(4).toDouble
      val relErr = math.abs(est - exact) / exact
      assert(relErr < 0.15,
        s"source ${r.getString(0)}: estimate $est vs exact $exact (err $relErr)")
    }
  }

  test("estimate within 10% across cardinality regimes incl. linear-counting range") {
    val s = spark
    import s.implicits._
    // 200 (small-range correction territory for m=512), 20k, 200k
    Seq(200L, 20000L, 200000L).foreach { n =>
      val toks = spark.range(n)
        .select(lit("g").as("g"), concat(lit("tok_"), col("id")).as("tok"))
      val row = Profiling.hllSummary(toks, "g", "tok").collect().head
      val est = Profiling.hllEstimate(row.getLong(1), row.getLong(3).toDouble)
      val relErr = math.abs(est - n) / n.toDouble
      assert(relErr < 0.10, s"n=$n: estimate $est (err $relErr)")
    }
  }

  test("registers are duplicate-insensitive and merge as elementwise max") {
    val s = spark
    import s.implicits._
    val once = spark.range(5000)
      .select(lit("g").as("g"), concat(lit("t"), col("id")).as("tok"))
    // every token fed 3 times: identical registers, identical summary
    val thrice = once.unionAll(once).unionAll(once)
    val a = Profiling.hllSummary(once, "g", "tok").collect().head
    val b = Profiling.hllSummary(thrice, "g", "tok").collect().head
    assert(a.getLong(1) == b.getLong(1) && a.getLong(2) == b.getLong(2)
      && a.getLong(3) == b.getLong(3))
  }

  test("overlap gate: merged-register union summary == rescan of the concatenated set") {
    val rows = Profiling.approxNdvOverlap(spark, sf0001)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("a", "b", "union"))
    // rescan path: both years' customers fed as ONE group — the union
    // row produced by register max-merge must match it field for field
    val base = graft.Tables.orders(spark, sf0001)
      .filter(year(col("o_orderdate")).isin(1996, 1997))
      .select(lit("u").as("g"), col("o_custkey").cast("string").as("ck"))
    val rescan = Profiling.hllSummary(base, "g", "ck").collect().head
    val u = rows("union")
    assert(u.getLong(1) == rescan.getLong(1) && u.getLong(2) == rescan.getLong(2)
      && u.getLong(3) == rescan.getLong(3),
      s"merge $u vs rescan $rescan")
  }

  test("inclusion-exclusion intersection estimate tracks the exact overlap") {
    val rows = Profiling.approxNdvOverlap(spark, sf0001)
      .collect().map(r => r.getString(0) -> r).toMap
    def est(k: String) =
      Profiling.hllEstimate(rows(k).getLong(1), rows(k).getLong(3).toDouble)
    val interEst = est("a") + est("b") - est("union")
    // exact intersection by inclusion-exclusion over the exact columns
    val interExact = (rows("a").getLong(4) + rows("b").getLong(4)
      - rows("union").getLong(4)).toDouble
    assert(interExact > 0, "fixture lost its overlapping customers")
    // three sketches' errors compound: allow 3× the single-sketch 15%
    val relErr = math.abs(interEst - interExact) / interExact
    assert(relErr < 0.45, s"intersection est $interEst vs exact $interExact")
  }
}
