package graft

import org.apache.spark.sql.functions._

import graft.functions.Profiling

/** Histogram invariants the oracle hash can't see failing gracefully:
  * buckets partition the value range exactly and counts conserve rows.
  */
class HistogramSpec extends SparkTestBase {

  test("buckets partition [min, max] in cents and counts sum to rows") {
    val rows = Profiling.columnHistogram(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val li = Profiling.ProfileColumns.map { c =>
      c -> Tables.lineitem(spark, sf0001)
        .select(expr(s"CAST(round($c * 100) AS BIGINT)").as("vi"))
        .filter(col("vi").isNotNull)
        .agg(count(lit(1)), min("vi"), max("vi"))
        .collect()(0)
    }.toMap
    Profiling.ProfileColumns.foreach { c =>
      val bs = rows.filter(_.getString(0) == c).sortBy(_.getAs[Long]("bucket"))
      assert(bs.nonEmpty, s"$c has no buckets")
      val (nRows, mini, maxi) =
        (li(c).getLong(0), li(c).getLong(1), li(c).getLong(2))
      assert(bs.map(_.getAs[Long]("n")).sum === nRows, s"$c counts don't conserve")
      // non-empty buckets sit inside [mini, maxi] with lo ≤ hi, strictly
      // increasing and non-overlapping in bucket order
      assert(bs.head.getAs[Long]("lo_cents") >= mini)
      assert(bs.last.getAs[Long]("hi_cents") >= maxi ||
        bs.last.getAs[Long]("hi_cents") >= bs.last.getAs[Long]("lo_cents"))
      bs.foreach { b =>
        assert(b.getAs[Long]("lo_cents") <= b.getAs[Long]("hi_cents"), s"$c empty span")
      }
      bs.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("hi_cents") < b.getAs[Long]("lo_cents"),
            s"$c buckets overlap")
        case _ =>
      }
      assert(bs.map(_.getAs[Long]("bucket")).forall(b =>
        b >= 0 && b < Profiling.HistogramBuckets))
    }
  }

  test("band equi-depth == exact equi-depth on tie-free data") {
    import spark.implicits._
    // distinct values, sizes deliberately not divisible by B, values
    // shuffled by a fixed LCG so ingestion order proves nothing
    val B = Profiling.HistogramBuckets
    val rows = (Seq("a" -> 1003, "b" -> 64, "c" -> 257).flatMap {
      case (c, n) =>
        (0 until n).map(i => (c, ((i.toLong * 48271) % 2147483647) * 100 + i))
    }).toDF("column_name", "vi")
    val exact = Profiling.depthHistogramExact(rows, B).collect().map(_.toSeq)
    val band = Profiling.depthHistogramBand(rows, B).collect().map(_.toSeq)
    assert(exact.nonEmpty)
    assert(band.toSeq === exact.toSeq,
      "range bucketing at ceil(n·j/B) boundaries must replicate the rank formula")
  }

  test("band equi-depth keeps tie groups whole and conserves counts") {
    import spark.implicits._
    val B = Profiling.HistogramBuckets
    // one giant tie group (value 500 × 600 rows) straddling boundaries,
    // plus a distinct tail — the case where the exact form splits by
    // arbitrary rank and the band form must NOT
    val rows = ((0 until 600).map(_ => ("t", 500L)) ++
      (0 until 400).map(i => ("t", 1000L + i))).toDF("column_name", "vi")
    val band = Profiling.depthHistogramBand(rows, B).collect()
      .sortBy(_.getAs[Long]("bucket"))
    assert(band.map(_.getAs[Long]("n")).sum === 1000L)
    // the tie value occupies exactly one bucket: buckets are
    // value-determined, so ranges never overlap — strictly
    band.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("hi_cents") < b.getAs[Long]("lo_cents"),
          "band buckets must be strictly disjoint in value")
      case _ =>
    }
    val tieBuckets = band.filter(r => r.getAs[Long]("lo_cents") <= 500L &&
      500L <= r.getAs[Long]("hi_cents"))
    assert(tieBuckets.length === 1)
    assert(tieBuckets.head.getAs[Long]("n") >= 600L)
  }

  test("equi-depth buckets balance counts and order their value ranges") {
    val B = Profiling.HistogramBuckets
    val rows = Profiling.columnHistogramDepth(spark, sf0001).collect()
    Profiling.ProfileColumns.foreach { c =>
      val bs = rows.filter(_.getString(0) == c).sortBy(_.getAs[Long]("bucket"))
      assert(bs.length === B, s"$c must fill all $B depth buckets")
      val ns = bs.map(_.getAs[Long]("n"))
      // (rn−1)·B div n puts bucket sizes within 1 of each other
      assert(ns.max - ns.min <= 1, s"$c depth buckets unbalanced: ${ns.toSeq}")
      // value ranges are ordered (ties may share a boundary value)
      bs.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("hi_cents") <= b.getAs[Long]("lo_cents"),
            s"$c depth buckets out of order")
        case _ =>
      }
      bs.foreach(b =>
        assert(b.getAs[Long]("lo_cents") <= b.getAs[Long]("hi_cents")))
    }
  }
}
