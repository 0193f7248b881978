package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated TPC-H-ish parquet tables
  * (see TESTDATA.md). Centralizing the reads keeps schema
  * normalization (notably the nanosecond timestamp in `events`) in one
  * place so every operator and oracle sees identical values.
  *
  * The reference engine has no external sources at all — every input is
  * an in-memory collection (`/root/reference/.../ElementsWithGapsSource.java:34-180`).
  * Parquet scans with column pruning + predicate pushdown are the
  * Spark-native replacement surface (SURVEY.md §2.2 B1/B2).
  */
object Tables {
  private def path(dir: String, name: String) = s"$dir/$name.parquet"

  def region(s: SparkSession, dir: String): DataFrame   = s.read.parquet(path(dir, "region"))
  def nation(s: SparkSession, dir: String): DataFrame   = s.read.parquet(path(dir, "nation"))
  def customer(s: SparkSession, dir: String): DataFrame = s.read.parquet(path(dir, "customer"))
  def supplier(s: SparkSession, dir: String): DataFrame = s.read.parquet(path(dir, "supplier"))
  def part(s: SparkSession, dir: String): DataFrame     = s.read.parquet(path(dir, "part"))
  def orders(s: SparkSession, dir: String): DataFrame   = s.read.parquet(path(dir, "orders"))
  def lineitem(s: SparkSession, dir: String): DataFrame = s.read.parquet(path(dir, "lineitem"))
  def documents(s: SparkSession, dir: String): DataFrame = s.read.parquet(path(dir, "documents"))
  def embeddings(s: SparkSession, dir: String): DataFrame = s.read.parquet(path(dir, "embeddings"))

  /** `events.ts` is parquet TIMESTAMP(NANOS). Spark only reads nanos as
    * LongType (spark.sql.legacy.parquet.nanosAsLong); we truncate
    * ns → µs exactly like DuckDB's TIMESTAMP_NS → TIMESTAMP coercion so
    * both engines agree to the microsecond. Integer `div` (not `/`)
    * avoids the double round-trip that loses sub-µs precision at
    * 1.7e18 ns magnitudes.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(path(dir, "events"))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
