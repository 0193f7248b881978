package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated TPC-H-ish parquet tables
  * (see TESTDATA.md). Centralizing the reads keeps schema
  * normalization (notably the physical encoding of `events.ts`, which has
  * changed across testdata generations) in one place so every operator and
  * oracle sees identical values regardless of how the parquet was written.
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
  def orders(s: SparkSession, dir: String): DataFrame =
    requireTemporal("orders", s.read.parquet(path(dir, "orders")), "o_orderdate")
  def lineitem(s: SparkSession, dir: String): DataFrame =
    requireTemporal("lineitem", s.read.parquet(path(dir, "lineitem")), "l_shipdate")
  def documents(s: SparkSession, dir: String): DataFrame = s.read.parquet(path(dir, "documents"))
  def embeddings(s: SparkSession, dir: String): DataFrame = s.read.parquet(path(dir, "embeddings"))

  /** `events.ts` has shipped in different physical parquet encodings across
    * testdata generations — TIMESTAMP(NANOS) (which Spark only reads as
    * BIGINT nanos under `spark.sql.legacy.parquet.nanosAsLong`) and plain
    * `timestamp[us]` (which Spark reads as TIMESTAMP_NTZ). A real lake mixes
    * all of these side by side, so the loader adapts to the schema it reads
    * instead of assuming one encoding. Every encoding is normalized to a
    * session-zone TIMESTAMP with identical µs values:
    *
    *  - BIGINT  → epoch-nanos; integer `div 1000` truncates ns → µs exactly
    *    like DuckDB's TIMESTAMP_NS → TIMESTAMP coercion (no double
    *    round-trip, which loses sub-µs precision at 1.7e18 magnitudes).
    *  - TIMESTAMP_NTZ → cast to TIMESTAMP. Value-preserving because every
    *    session pins `spark.sql.session.timeZone=UTC` (Verify/Bench/
    *    SparkTestBase), so wall-clock == instant.
    *  - TIMESTAMP → already what we want.
    *
    * Anything else is a loud error, not a silent misread.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = s.read.parquet(path(dir, "events"))
    df.withColumn("ts", normalizeEventTime(df, "ts"))
  }

  /** Scale-adaptive scan spreader (r19, guide §2 "make partitioning
    * scale-adaptive — derive from input size — rather than a constant
    * tuned for either local mode or the cluster"): when a scan plans
    * FEWER partitions than the session's parallelism, redistribute it
    * before CPU-heavy per-row work (stack/explode/encode pipelines).
    *
    * Why it exists: the bench corpus ships one parquet file with ONE row
    * group per table, so every scan is a single task no matter the core
    * count — split-size tuning cannot help (parquet splits at row-group
    * boundaries), and a 600k-row stack/explode then runs 1-of-32 cores
    * (measured: the column-profile family spent ~0.9 s single-task in the
    * scan stage at sf0.1/32 cores). At 100 TB the condition is false —
    * scans plan thousands of splits ≥ cores — so this is a no-op there
    * and never adds an exchange to an already-parallel corpus scan.
    *
    * The exchange is round-robin (no key): every downstream consumer in
    * this repo is an exact aggregate/distinct/join whose result is
    * partition-layout-independent (the cross-engine determinism
    * discipline), and Spark's sort-before-repartition default keeps the
    * assignment retry-deterministic. */
  def spread(s: SparkSession, df: DataFrame): DataFrame = {
    val cores = s.sparkContext.defaultParallelism
    if (plannedScanPartitions(s, df) >= cores) df else df.repartition(cores)
  }

  /** Planned partition count of `df`'s scan, memoized per (session,
    * leaf files, parallelism). r20 (ADVICE r19): `df.rdd` at plan-build
    * time forces a throwaway analysis + optimization + physical-planning
    * pass (plus file listing) for every query CONSTRUCTION that calls
    * [[spread]] — the count it yields is a pure function of the leaf
    * file set and the session's split config, so one probe per
    * (session, table) serves every later construction. Frames without a
    * file scan leaf (none of the current call sites) fall back to the
    * direct probe, unmemoized. */
  private val spreadMemo =
    new graft.util.BoundedMemo[(String, String, Int), Int](64)
  private def plannedScanPartitions(s: SparkSession, df: DataFrame): Int = {
    val allLeaves = df.queryExecution.analyzed.collectLeaves()
    val leaves = allLeaves.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation
          if r.relation.isInstanceOf[
            org.apache.spark.sql.execution.datasources.HadoopFsRelation] =>
        r.relation
          .asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.rootPaths.mkString(",")
    }
    // only memoize when EVERY leaf is a file scan — for anything else
    // the planned count is not a pure function of the file set
    if (leaves.isEmpty || leaves.size != allLeaves.size)
      df.rdd.getNumPartitions
    else
      spreadMemo.getOrElseUpdate(
        (org.apache.spark.sql.graft.ColumnShim.sessionUuid(s),
          leaves.mkString(";"), s.sparkContext.defaultParallelism))(
        df.rdd.getNumPartitions)
  }

  /** Loud schema guard for the relational tables' temporal columns
    * (VERDICT r9 stretch: the events break would reproduce in the
    * relational family on a date→string or date→integer drift). Every
    * consumer (`datediff`, `date_format`, `lead` ordering, window ranges)
    * is value-identical across TIMESTAMP / TIMESTAMP_NTZ / DATE under the
    * pinned UTC sessions, so those pass through untouched; anything else
    * fails HERE, naming the table and column, instead of as dozens of
    * cryptic downstream analysis errors. */
  private def requireTemporal(table: String, df: DataFrame, cols: String*): DataFrame = {
    cols.foreach { c =>
      df.schema(c).dataType match {
        case TimestampType | TimestampNTZType | DateType => ()
        case other =>
          throw new IllegalArgumentException(
            s"$table.$c read as $other; expected TIMESTAMP, TIMESTAMP_NTZ, or DATE — " +
              "the testdata encoding changed; extend Tables normalization for it")
      }
    }
    df
  }

  /** Normalize a timestamp-ish column to session-zone TIMESTAMP regardless of
    * how the parquet writer encoded it (see [[events]] for the rationale).
    * Supported source types: BIGINT epoch-nanos, TIMESTAMP_NTZ, TIMESTAMP.
    */
  def normalizeEventTime(df: DataFrame, name: String): Column =
    df.schema(name).dataType match {
      case LongType         => timestamp_micros(expr(s"$name div 1000"))
      case TimestampNTZType => col(name).cast(TimestampType)
      case TimestampType    => col(name)
      case other =>
        throw new IllegalArgumentException(
          s"Column '$name' has unsupported type $other; expected one of " +
            "BIGINT (epoch-nanos), TIMESTAMP_NTZ (timestamp[us]), or TIMESTAMP")
    }
}
