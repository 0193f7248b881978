package graft

import graft.functions.TextAnalysis

/** Pins the water-filling allocation beyond the cross-engine hash gate:
  * the level must be FEASIBLE (admitted mass fits the budget) and
  * MAXIMAL (level+1 would overflow), small sources must be whole, and
  * capped sources must sit exactly at the level. */
class WaterfillSpec extends SparkTestBase {

  private def check(dir: String): Unit = {
    val rows = TextAnalysis.tokenBudgetWaterfill(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val level = rows.head._5
    assert(rows.forall(_._5 == level))
    val budget = rows.map(_._2).sum / 2
    val admitted = rows.map(_._3).sum
    assert(admitted <= budget, s"$dir: admitted $admitted > budget $budget")
    val atLevelPlusOne = rows.map { case (_, t, _, _, _) => math.min(t, level + 1) }.sum
    assert(atLevelPlusOne > budget || rows.forall { case (_, t, a, _, _) => a == t },
      s"$dir: level $level not maximal (level+1 still fits $atLevelPlusOne <= $budget)")
    rows.foreach { case (src, t, a, ppm, _) =>
      assert(a == math.min(t, level), s"$dir $src: admitted $a != min($t, $level)")
      assert(ppm == a * 1000000L / t, s"$dir $src: rate_ppm")
    }
  }

  test("waterfill level is feasible and maximal at all three SFs") {
    check(sf0001)
    check("/root/testdata/sf0.01")
    check("/root/testdata/sf0.1")
  }

  test("closed-form level == brute-force maximal level on fuzzed corpora") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(23)
    // edge shapes: ties, a dominating giant, a single source, uniform
    val cases = Seq(
      Seq(5L, 5L, 5L, 5L),            // all tied
      Seq(1L, 1L, 1L, 1000L),         // one giant
      Seq(7L),                        // single source
      Seq(3L, 3L, 9L, 9L, 20L),       // tie runs straddling the level
      Seq.fill(6)(4L),                // uniform
    ) ++ (1 to 5).map(_ => Seq.fill(2 + rnd.nextInt(8))(1L + rnd.nextInt(50).toLong))
    cases.zipWithIndex.foreach { case (ts, i) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"wf_fuzz_$i").toString
      ts.zipWithIndex.map { case (n, j) =>
        // n whitespace tokens exactly
        (j.toLong, Seq.fill(n.toInt)("w").mkString(" "), "en", s"src$j", n)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val rows = TextAnalysis.tokenBudgetWaterfill(spark, tmp).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4)))
      val budget = ts.sum / 2
      val level = rows.head._4
      // brute-force maximal feasible level
      val feasible = (l: Long) => ts.map(t => math.min(t, l)).sum <= budget
      val bruteLevel = (0L to ts.max).reverse.find(feasible).getOrElse(0L)
      val admitted = rows.map(_._3).sum
      val bruteAdmitted = ts.map(t => math.min(t, bruteLevel)).sum
      assert(admitted == bruteAdmitted,
        s"case $i ($ts): admitted $admitted (level $level) != brute $bruteAdmitted (level $bruteLevel)")
      rows.foreach { case (src, t, a, l) =>
        assert(a == math.min(t, l), s"case $i $src")
      }
    }
  }
}
