package graft

import org.apache.spark.sql.functions._

/** Fuzz pin for the algebra `dedup_editdist` rests on: the
  * threshold-banded `levenshtein(a, b, k)` with the per-row ceiling
  * `k = (len·ppm) div 1e6` accepts EXACTLY the pairs the plain
  * `lev·1e6 div len ≤ ppm` filter accepts, and returns the exact
  * distance for them — over random mutation pairs (substitutions,
  * insertions, deletions at random rates, so pairs land on BOTH sides
  * of the ceiling) and a driver-side classic Wagner–Fischer model.
  */
class EditDistFuzzSpec extends SparkTestBase {

  private def wagnerFischer(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0); dp(0) = j
      for (i <- 1 to a.length) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(a.length)
  }

  test("banded-threshold lev == plain lev + ppm filter on random mutation pairs") {
    val s = spark
    import s.implicits._
    val ppm = graft.functions.Dedup.EditDupPpm
    val rnd = new scala.util.Random(14)
    val alpha = "abcdefg "
    def randStr(n: Int) = Seq.fill(n)(alpha(rnd.nextInt(alpha.length))).mkString
    def mutate(t: String, rate: Double): String = {
      val sb = new StringBuilder
      t.foreach { c =>
        rnd.nextDouble() match {
          case r if r < rate / 3       => // deletion
          case r if r < 2 * rate / 3   => sb += alpha(rnd.nextInt(alpha.length)) // sub
          case r if r < rate           => sb += c += alpha(rnd.nextInt(alpha.length)) // ins
          case _                       => sb += c
        }
      }
      sb.toString
    }
    val pairs = (1 to 120).map { i =>
      val t = randStr(20 + rnd.nextInt(120))
      // rates straddle the 20% ceiling so both accept and reject occur
      (i.toLong, t, mutate(t, rnd.nextDouble() * 0.5))
    }
    val df = pairs.toDF("id", "text_a", "text_b")
      .select(col("id"), col("text_a"), col("text_b"),
        greatest(length(col("text_a")), length(col("text_b"))).cast("long").as("len"))
      .select(col("id"), col("len"),
        graft.functions.Dedup.bandedLevExpr(
          col("text_a"), col("text_b"), col("len"), ppm).as("banded"),
        levenshtein(col("text_a"), col("text_b")).cast("long").as("plain"))
    val rows = df.collect().map(r =>
      (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val model = pairs.map { case (id, a, b) => id -> wagnerFischer(a, b) }.toMap
    var accepted, rejected = 0
    pairs.foreach { case (id, a, b) =>
      val (len, banded, plain) = rows(id)
      assert(plain == model(id), s"pair $id: spark lev $plain != model ${model(id)}")
      val passes = plain * 1000000L / len <= ppm
      if (passes) { accepted += 1
        assert(banded == plain, s"pair $id: banded $banded != plain $plain despite passing")
      } else { rejected += 1
        assert(banded == -1L, s"pair $id: banded $banded != -1 despite failing the ppm filter")
      }
    }
    assert(accepted > 10 && rejected > 10,
      s"fuzz did not straddle the ceiling: $accepted accepted / $rejected rejected")
  }

  test("bandedLevCeil is TIGHT: k passes the ppm filter, k+1 fails, at every len") {
    // the naive ceiling (len·ppm) div 1e6 is one short whenever
    // (len·ppm mod 1e6) + len − 1 ≥ 1e6 — sweep lens across and far
    // beyond that regime (long texts are exactly where the banded DP
    // matters most) for several ppm settings including the production one
    val rnd = new scala.util.Random(15)
    val ppms = Seq(graft.functions.Dedup.EditDupPpm, 142857L, 999999L, 1L, 500000L)
    val lens = (Seq(1L, 7L, 199999L, 200004L, 1000001L, 5000000L) ++
      Seq.fill(200)(1L + rnd.nextInt(10000000).toLong)).distinct
    var naiveDivergences = 0
    for (ppm <- ppms; len <- lens) {
      val k = graft.functions.Dedup.bandedLevCeil(len, ppm)
      assert(k * 1000000L / len <= ppm,
        s"ceiling $k itself fails the filter at len=$len ppm=$ppm")
      assert((k + 1) * 1000000L / len > ppm,
        s"ceiling $k is not tight at len=$len ppm=$ppm: ${k + 1} still passes")
      if (len * ppm / 1000000L != k) naiveDivergences += 1
    }
    assert(naiveDivergences > 0,
      "sweep never exercised a len where the naive ceiling is wrong")
  }

  test("divergence case end-to-end: a pair the naive ceiling drops, the tight one keeps") {
    val s = spark
    import s.implicits._
    // len=7, ppm=142857: naive k = 999999 div 1e6 = 0 (would return -1
    // for ANY differing pair), tight k = (142858·7−1) div 1e6 = 1; the
    // oracle filter keeps lev=1 (1e6 div 7 = 142857 ≤ ppm)
    val ppm = 142857L
    assert(graft.functions.Dedup.bandedLevCeil(7L, ppm) == 1L)
    assert(7L * ppm / 1000000L == 0L, "case no longer exercises the naive gap")
    val row = Seq(("aaaaaaa", "aaaaaab")).toDF("text_a", "text_b")
      .withColumn("len", greatest(length(col("text_a")), length(col("text_b"))).cast("long"))
      .select(graft.functions.Dedup.bandedLevExpr(
        col("text_a"), col("text_b"), col("len"), ppm).as("lev"))
      .collect()(0)
    assert(row.getLong(0) == 1L,
      s"tight banded form returned ${row.getLong(0)}, expected lev=1 (oracle keeps this pair)")
  }
}
