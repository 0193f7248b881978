package graft

import org.apache.spark.sql.functions._

import graft.functions.Profiling

/** Pins the Count-Min sketch's genuinely-approximate regime — the
  * `approx_count_min` gate runs at vocabulary ≪ width where estimates
  * are (almost always) exact, so the sketch properties need forcing
  * here: never undercounts, overcounts under forced collisions, and
  * shard sketches merge by cell-wise addition (the property that lets a
  * 100 TB scan build per-partition counter tables and fold them).
  */
class CountMinSpec extends SparkTestBase {

  // 60 distinct tokens into 8 buckets/row (wBits=3) — collisions in
  // every row by pigeonhole; counts 1..5 per token so errors are visible.
  private def tinyToks = {
    val s = spark
    import s.implicits._
    (0 until 60).flatMap(i => Seq.fill(i % 5 + 1)(s"tok$i")).toDF("tok")
  }

  test("estimates never undercount, and forced collisions overcount") {
    val toks = tinyToks
    val counters = Profiling.cmsCounters(toks, "tok", wBits = 3, d = 4)
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("n_exact"))
    val rows = Profiling.cmsEstimates(counters, exact, "tok", wBits = 3, d = 4)
      .collect()
    assert(rows.length === 60)
    assert(rows.forall(r => r.getAs[Long]("n_est") >= r.getAs[Long]("n_exact")),
      "CMS must never undercount")
    assert(rows.exists(r => r.getAs[Long]("n_est") > r.getAs[Long]("n_exact")),
      "60 tokens in 8 buckets/row must collide somewhere — regime check")
  }

  test("shard sketches merge by summing aligned cells") {
    val toks = tinyToks.cache()
    val h1 = toks.filter(pmod(crc32(col("tok")), lit(2)) === 0)
    val h2 = toks.filter(pmod(crc32(col("tok")), lit(2)) === 1)
    def cells(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Long] =
      df.collect().map(r =>
        (r.getAs[Int]("row").toLong, r.getAs[Long]("bucket")) -> r.getAs[Long]("cnt")).toMap
    val whole = cells(Profiling.cmsCounters(toks, "tok", wBits = 3, d = 4))
    val merged = cells(
      Profiling.cmsCounters(h1, "tok", wBits = 3, d = 4)
        .unionByName(Profiling.cmsCounters(h2, "tok", wBits = 3, d = 4))
        .groupBy("row", "bucket").agg(sum(col("cnt")).as("cnt")))
    assert(merged === whole)
    toks.unpersist(blocking = false)
  }

  test("unseen probes survive the lookup and estimate 0 — JVM parity") {
    // One seen token in a wide sketch (4 rows × 256 buckets): any unseen
    // probe hits an empty cell in at least one row, so the min must reach
    // through the sparse counter table's ABSENT rows to 0. The pre-fix
    // inner join either dropped the probe (all d cells empty) or took the
    // min over only the colliding cells — both diverge from the JVM
    // CountMin.estimate, which this test holds as the reference.
    val s = spark
    import s.implicits._
    val toks = Seq("the-one-seen-token").toDF("tok")
    val counters = Profiling.cmsCounters(toks, "tok", wBits = 8, d = 4)
    val probes = Seq("never-streamed-a", "never-streamed-b", "the-one-seen-token")
      .toDF("tok")
    val got = Profiling.cmsEstimates(counters, probes, "tok", wBits = 8, d = 4)
      .collect().map(r => r.getAs[String]("tok") -> r.getAs[Long]("n_est")).toMap
    val jvm = graft.functions.sketch.CountMin(wBits = 8, d = 4)
    jvm.add("the-one-seen-token")
    assert(got.keySet === Set("never-streamed-a", "never-streamed-b",
      "the-one-seen-token"), "unseen probes must not be dropped")
    got.foreach { case (tok, est) =>
      assert(est === jvm.estimate(tok), s"JVM parity broken for $tok") }
    assert(got("never-streamed-a") === 0L)
    assert(got("never-streamed-b") === 0L)
    assert(got("the-one-seen-token") === 1L)
  }

  test("gate shape on sf0.001: 20 probes, estimates bound exact counts") {
    val rows = Profiling.approxCountMin(spark, sf0001).collect()
    assert(rows.length === 20)
    assert(rows.forall(r => r.getAs[Long]("n_est") >= r.getAs[Long]("n_exact")))
  }
}
