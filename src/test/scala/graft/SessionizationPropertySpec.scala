package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sessionization

/** Property test the reference never had (SURVEY §5): for ANY event
  * script, keys with inter-event gaps ≤ ttl accumulate and gaps > ttl
  * reset — checked against an in-memory reference fold model.
  */
class SessionizationPropertySpec extends AnyFunSuite {

  lazy val spark = SparkTestBase.session

  private val ttl = 1000L // µs, small synthetic timescale

  /** (key, tsMicros, valueCents) scripts with gaps straddling the ttl. */
  private val scriptGen: Gen[List[(String, Long, Long)]] = for {
    n <- Gen.choose(1, 60)
    keys <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
    gaps <- Gen.listOfN(n, Gen.choose(0L, 3 * ttl))
    values <- Gen.listOfN(n, Gen.choose(1L, 500L))
  } yield {
    val ts = gaps.scanLeft(1000000L)(_ + _).tail
    keys.lazyZip(ts).lazyZip(values).toList
  }

  /** Reference model: per key, in ts order, reset the sum when the gap
    * exceeds ttl. */
  private def model(script: List[(String, Long, Long)]): Map[(String, Long), Long] =
    script.groupBy(_._1).flatMap { case (k, evs) =>
      var last = Long.MinValue
      var sum = 0L
      evs.sortBy(_._2).map { case (_, ts, v) =>
        if (last != Long.MinValue && ts - last > ttl) sum = 0L
        sum += v
        last = ts
        (k, ts) -> sum
      }
    }

  test("for any script: gap <= ttl accumulates, gap > ttl resets (vs fold model)") {
    val s = spark
    import s.implicits._
    val prop = Prop.forAll(scriptGen) { script =>
      // distinct (key, ts) required: same-instant same-key events have no
      // defined order in either engine
      val dedup = script.groupBy(t => (t._1, t._2)).map(_._2.head).toList
      dedup.isEmpty || {
        val df = dedup.toDF("k", "us", "cents")
          .withColumn("seq", col("us")) // ts is the total order
        val got = Sessionization.runningSumByGap(
          df, key = "k", tsMicros = col("us"), orderCol = "seq",
          value = col("cents"), ttlMicros = ttl)
          .select(col("k"), col("us"), col("running_value").cast("long"))
          .as[(String, Long, Long)].collect()
          .map { case (k, us, v) => (k, us) -> v }.toMap
        got == model(dedup)
      }
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(result.passed, s"property falsified: ${result.status}")
  }

  test("salted sessionization == plain for any script and any legal slice width") {
    val s = spark
    import s.implicits._
    val sliceGen = Gen.oneOf(ttl, 2 * ttl, 5 * ttl)
    val prop = Prop.forAll(scriptGen, sliceGen) { (script, slice) =>
      val dedup = script.groupBy(t => (t._1, t._2)).map(_._2.head).toList
      dedup.isEmpty || {
        val df = dedup.toDF("k", "us", "cents").withColumn("seq", col("us"))
        def collect(out: org.apache.spark.sql.DataFrame) = out
          .select(col("k"), col("seq"), col("session_id"),
            col("running_value").cast("long"))
          .as[(String, Long, Long, Long)].collect().sorted.toSeq
        val plain = collect(Sessionization.runningSumByGap(
          df, "k", col("us"), "seq", col("cents"), ttl))
        val salted = collect(Sessionization.runningSumByGapSalted(
          df, "k", col("us"), "seq", col("cents"), ttl, slice))
        plain == salted
      }
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(result.passed, s"property falsified: ${result.status}")
  }

  test("salted sessionization survives a hot key spanning many slices") {
    val s = spark
    import s.implicits._
    // one key, 20k events in bursts: sessions of 100 events (gap 10)
    // separated by ttl+1 gaps, spread over thousands of slices
    val events = (0 until 20000).map { i =>
      val session = i / 100
      val ts = 1000000L + session * (100 * 10L + ttl + 1) + (i % 100) * 10L
      ("hot", ts, 1L)
    }
    val df = events.toDF("k", "us", "cents").withColumn("seq", col("us"))
    val salted = Sessionization.runningSumByGapSalted(
      df, "k", col("us"), "seq", col("cents"), ttl, sliceMicros = ttl)
      .select(col("session_id"), col("running_value").cast("long"))
      .as[(Long, Long)].collect()
    assert(salted.length == 20000)
    assert(salted.map(_._1).distinct.sorted.toSeq == (1L to 200L))
    // every session's running sum ends at exactly 100 (1 cent per event)
    val maxPerSession = salted.groupBy(_._1).view.mapValues(_.map(_._2).max)
    assert(maxPerSession.values.forall(_ == 100L))
  }
}
