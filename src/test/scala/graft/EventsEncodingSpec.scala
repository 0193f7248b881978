package graft

import java.sql.Timestamp
import java.time.LocalDateTime

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Encoding-matrix pin for `Tables.events` (VERDICT r9 #2): the driver has
  * regenerated `/root/testdata` with different physical parquet encodings of
  * `events.ts` across rounds — TIMESTAMP(NANOS), which Spark reads as BIGINT
  * nanos under the legacy flag, then plain `timestamp[us]`, which Spark reads
  * as TIMESTAMP_NTZ. Round 9 lost 19 correctness gates, 24 tests, and 32
  * bench lines to a loader that assumed exactly one of those. This spec
  * writes the same instants in all three encodings Spark can produce, loads
  * each back through `Tables.events`, and asserts identical normalized
  * `unix_micros(ts)` output — so the next regeneration cannot silently break
  * ingestion again.
  */
class EventsEncodingSpec extends SparkTestBase {

  // Two instants with sub-millisecond parts so µs fidelity is actually
  // exercised: 2024-03-01T12:00:00.123456Z and 2024-03-01T12:00:01.654321Z.
  private val micros = Seq(1709294400123456L, 1709294401654321L)

  private val restCols = Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType))

  private def rows(tsValues: Seq[Any]): Seq[Row] =
    tsValues.zipWithIndex.map { case (ts, i) =>
      Row(i.toLong, ts, 7L, "click", 1.5, "{}")
    }

  private def writeVariant(dir: String, tsType: DataType, tsValues: Seq[Any]): String = {
    val schema = StructType(StructField("event_id", LongType) +: StructField("ts", tsType) +: restCols.tail)
    val out = java.nio.file.Files.createTempDirectory(s"graft-enc-$dir-").toString
    spark.createDataFrame(spark.sparkContext.parallelize(rows(tsValues)), schema)
      .repartition(1)
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    out
  }

  private def loadMicros(dir: String): Seq[Long] = {
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType === TimestampType,
      "Tables.events must normalize every encoding to session-zone TIMESTAMP")
    df.select(unix_micros(col("ts"))).orderBy("event_id").collect().map(_.getLong(0)).toSeq
  }

  test("BIGINT epoch-nanos, TIMESTAMP_NTZ, and TIMESTAMP encodings normalize identically") {
    // (a) epoch-nanos as int64 — byte-identical to parquet TIMESTAMP(NANOS)
    // read under spark.sql.legacy.parquet.nanosAsLong (Spark reads both as
    // LongType; the loader cannot and should not distinguish them).
    val nanosDir = writeVariant("nanos", LongType, micros.map(_ * 1000L))
    // (b) TIMESTAMP_NTZ — what plain timestamp[us] parquet reads back as.
    val ntzDir = writeVariant("ntz", TimestampNTZType,
      micros.map(us => LocalDateTime.ofEpochSecond(us / 1000000L, (us % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC)))
    // (c) TIMESTAMP — isAdjustedToUTC=true parquet. UTC session makes the
    // java.sql.Timestamp construction below land on the same instants.
    val tsDir = writeVariant("ts", TimestampType, micros.map { us =>
      val t = new Timestamp(us / 1000L)
      t.setNanos((us % 1000000L).toInt * 1000)
      t
    })

    assert(loadMicros(nanosDir) === micros)
    assert(loadMicros(ntzDir) === micros)
    assert(loadMicros(tsDir) === micros)
  }

  test("round-trips the NTZ encoding the current testdata actually uses") {
    // Guards the guard: if the bundled sf0.001 events table ever reads as a
    // type the loader does not recognize, fail here with the loader's own
    // message instead of nineteen downstream gate failures.
    val df = Tables.events(spark, sf0001)
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.limit(5).count() > 0)
  }

  test("unsupported ts types fail loudly, not silently") {
    val dir = writeVariant("bad", StringType, micros.map(_.toString))
    val ex = intercept[IllegalArgumentException](Tables.events(spark, dir))
    assert(ex.getMessage.contains("unsupported type"))
  }

  test("driver smoke: SparkEntry.entry returns rows on sf0.001") {
    // The round-9 break took the driver's smoke down with it (entry is
    // events-fed q14); pin it here next to the encoding matrix it
    // depends on.
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("relational temporal columns are guarded at the loader") {
    // A date→string drift in a regeneration must fail at Tables.orders
    // naming the table+column, not as analysis errors in every consumer.
    val out = java.nio.file.Files.createTempDirectory("graft-enc-orders-").toString
    spark.range(2).selectExpr(
        "id AS o_orderkey", "id AS o_custkey", "'O' AS o_orderstatus",
        "1.5 AS o_totalprice", "'1995-01-01' AS o_orderdate",
        "'1-URGENT' AS o_orderpriority")
      .write.mode("overwrite").parquet(s"$out/orders.parquet")
    val ex = intercept[IllegalArgumentException](Tables.orders(spark, out))
    assert(ex.getMessage.contains("orders.o_orderdate"))
    // the real testdata passes the guard unchanged
    assert(Tables.orders(spark, sf0001).limit(1).count() === 1)
    assert(Tables.lineitem(spark, sf0001).limit(1).count() === 1)
  }
}
