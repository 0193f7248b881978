package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source-format breadth (SURVEY B2): the engine consumes whatever the
  * DataSource API reads. Parquet is the primary path (typed, pushdown —
  * asserted elsewhere); JSON and CSV round-trip here with explicit
  * schemas (the production stance: schema inference over text formats is
  * a scale anti-pattern — one extra full scan and nondeterministic
  * typing).
  */
class SourceFormatsSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("us", LongType),
    StructField("value", DoubleType)))

  test("events round-trip losslessly through JSON and CSV with explicit schemas") {
    val base = Tables.events(spark, sf0001)
      .select(
        col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("value"))
    val expected = base.collect().map(_.toSeq).toSet

    val jsonDir = Files.createTempDirectory("graft_json").toString
    base.write.mode("overwrite").json(jsonDir)
    val fromJson = spark.read.schema(schema).json(jsonDir)
      .collect().map(_.toSeq).toSet
    assert(fromJson == expected, "JSON round-trip diverged")

    val csvDir = Files.createTempDirectory("graft_csv").toString
    base.write.mode("overwrite").option("header", "true").csv(csvDir)
    val fromCsv = spark.read.schema(schema).option("header", "true").csv(csvDir)
      .collect().map(_.toSeq).toSet
    assert(fromCsv == expected, "CSV round-trip diverged")

    // and a query composes identically over any source
    val viaJson = spark.read.schema(schema).json(jsonDir)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaParquet = base
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaJson == viaParquet)
  }

  test("ORC round-trips losslessly and pushes filters into the scan") {
    val base = Tables.events(spark, sf0001)
      .select(
        col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("value"))
    val orcDir = Files.createTempDirectory("graft_orc").toString
    base.write.mode("overwrite").orc(orcDir)
    val fromOrc = spark.read.orc(orcDir)
    assert(fromOrc.collect().map(_.toSeq).toSet == base.collect().map(_.toSeq).toSet,
      "ORC round-trip diverged")
    // columnar format ⇒ predicate + projection pushdown, same as parquet
    val plan = fromOrc
      .filter(col("user_id") === 7L).select("event_id", "us")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(user_id), EqualTo(user_id,7)]"),
      s"ORC filter not pushed:\n$plan")
    assert(plan.contains("ReadSchema: struct<event_id:bigint,user_id:bigint,us:bigint>"),
      s"ORC columns not pruned:\n$plan")
  }
}
