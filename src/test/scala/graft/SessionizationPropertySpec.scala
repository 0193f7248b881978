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
}
