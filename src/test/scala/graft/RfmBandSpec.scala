package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}

import graft.operators.Relational

/** Differential pin for the q65 band machinery: `ntileBandsDesc` must
  * reproduce the window `ntile(4)` assignment EXACTLY — including tie
  * splits, which the band path resolves through the boundary (metric,
  * key) tuple — while planning zero partition-less windows (the
  * single-partition global sorts that made the ntile form a
  * scale-killer at the 100-TB posture, VERDICT r12 item 1).
  */
class RfmBandSpec extends SparkTestBase {

  private def seg(df: DataFrame): Set[(Long, Long, Long, Long)] =
    df.select("o_custkey", "r_q", "f_q", "m_q").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  test("band quartiles == ntile quartiles on the gate corpus") {
    val perCust = Relational.rfmPerCustomer(spark, sf0001)
    assert(seg(Relational.rfmSegmentsBand(perCust)) ==
      seg(Relational.rfmSegmentsNtile(perCust)))
  }

  test("a NULL metric fails construction loudly, not as a shifted quantile") {
    // nulls are invisible to the percentile sketch / count stages but
    // ranked by the window form — the null probe (which rides the
    // sizing aggregate, no extra action) must reject them up front
    import spark.implicits._
    val withNull = Seq(
      (1L, Some(3L), 1L, 100L), (2L, None, 2L, 200L),
      (3L, Some(1L), 3L, 300L), (4L, Some(2L), 4L, 400L))
      .toDF("o_custkey", "last_day", "n_orders", "m_cents").localCheckpoint()
    val ex = intercept[IllegalArgumentException] {
      Relational.rfmSegmentsBand(withNull)
    }
    assert(ex.getMessage.contains("NULL row(s)"), s"wrong guard: $ex")
  }

  test("band quartiles == ntile quartiles on a tie-heavy corpus") {
    // 197 customers over only 2/1/3 distinct metric values — every
    // quartile boundary lands INSIDE a tie run (n_orders is even
    // singular: ALL four buckets split one run), so the assignment is
    // decided entirely by the custkey tie-break the boundary tuple
    // carries; 197 = 4·49+1 also exercises the uneven-bucket arithmetic
    import spark.implicits._
    val perCust = (1 to 197).map { c =>
      (c.toLong, (c % 2).toLong, 1L, ((c % 3) * 10).toLong)
    }.toDF("o_custkey", "last_day", "n_orders", "m_cents").localCheckpoint()
    assert(seg(Relational.rfmSegmentsBand(perCust)) ==
      seg(Relational.rfmSegmentsNtile(perCust)))
  }

  test("band quartiles == ntile quartiles under permuted keys (n = 4k)") {
    // shuffled non-contiguous keys + exact multiple of 4; metrics
    // correlated with key so boundaries sit at value changes too
    import spark.implicits._
    val perCust = new scala.util.Random(42).shuffle((1 to 200).toList).zipWithIndex.map {
      case (c, i) => (c.toLong * 7L, (i / 10).toLong, (i % 5).toLong, (i % 7).toLong * 100L)
    }.toDF("o_custkey", "last_day", "n_orders", "m_cents").localCheckpoint()
    assert(seg(Relational.rfmSegmentsBand(perCust)) ==
      seg(Relational.rfmSegmentsNtile(perCust)))
  }

  test("fuzz: band quartiles == ntile quartiles on 12 random tie-heavy frames") {
    import spark.implicits._
    val rnd = new scala.util.Random(1311)
    (1 to 12).foreach { case_ =>
      // n spans the uneven-bucket space (incl. n=4 minimum and n≡1..3
      // mod 4); metric cardinalities 1..6 force boundary-splitting ties
      val n = 4 + rnd.nextInt(300)
      val cr = 1 + rnd.nextInt(6)
      val cf = 1 + rnd.nextInt(6)
      val cm = 1 + rnd.nextInt(6)
      val keys = rnd.shuffle((1 to n).toList)
      val perCust = keys.map { k =>
        (k.toLong * (1 + rnd.nextInt(3)),
          rnd.nextInt(cr).toLong, rnd.nextInt(cf).toLong,
          rnd.nextInt(cm).toLong * 100L)
      }.toDF("o_custkey", "last_day", "n_orders", "m_cents")
        .dropDuplicates("o_custkey").localCheckpoint()
      if (perCust.count() >= 4) {
        val band = seg(Relational.rfmSegmentsBand(perCust))
        val ntile = seg(Relational.rfmSegmentsNtile(perCust))
        assert(band == ntile,
          s"case $case_ (n=$n, card=($cr,$cf,$cm)): ${(band diff ntile).take(3)}")
      }
    }
  }

  test("band quartiles == ntile quartiles at n = 50k (sketch-error regime, low accuracy)") {
    // accuracy 500 on 50k rows: the t-digest rank error (≤ n/accuracy =
    // 100 rows) is REAL here, so this exercises the bracket-margin
    // arithmetic, not just exact small-n sketches; cardinality 17 keeps
    // tie runs ~3k rows long across every boundary
    import spark.implicits._
    val rnd = new scala.util.Random(65)
    val perCust = (1 to 50000).map { k =>
      (k.toLong, rnd.nextInt(17).toLong, rnd.nextInt(5).toLong,
        rnd.nextInt(17).toLong * 100L)
    }.toDF("o_custkey", "last_day", "n_orders", "m_cents").localCheckpoint()
    val band = seg(Relational.ntileBandsDesc(perCust, "o_custkey",
      Seq(("last_day", "r_q"), ("n_orders", "f_q"), ("m_cents", "m_q")),
      4, accuracy = 500))
    assert(band == seg(Relational.rfmSegmentsNtile(perCust)))
  }

  test("q65 gate plan contains no partition-less window") {
    val df = SparkEntry.queries("q65_rfm")(spark, sf0001)
    val bare = df.queryExecution.optimizedPlan.collect {
      case w: LogicalWindow if w.partitionSpec.isEmpty => w
    }
    assert(bare.isEmpty,
      s"single-partition window crept back into q65: ${bare.mkString("\n")}")
    // and the differential oracle form DOES plan them — proving the
    // detector actually sees partition-less windows
    val ntileForm = Relational.rfmSegmentsNtile(
      Relational.rfmPerCustomer(spark, sf0001))
    assert(ntileForm.queryExecution.optimizedPlan.collect {
      case w: LogicalWindow if w.partitionSpec.isEmpty => w
    }.nonEmpty)
  }
}
