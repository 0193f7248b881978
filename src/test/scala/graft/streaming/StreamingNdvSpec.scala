package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.{Portable, Profiling}
import graft.functions.sketch.Hll

/** Streaming NDV == batch `hllSummary` register parity, and the JVM-side
  * h52 hash == the relational md5 formulation it claims to equal.
  */
class StreamingNdvSpec extends SparkTestBase {

  test("h52 equals the relational md5 h32/h32b construction") {
    val s = spark
    import s.implicits._
    val toks = (0 until 200).map(i => s"tok_$i x")
    val relational = toks.toDF("tok")
      .select(col("tok"),
        (Portable.h32(col("tok")) * lit(1L << 20)
          + pmod(Portable.h32b(col("tok")), lit(1L << 20))).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    toks.foreach { t =>
      assert(Hll.h52(t) == relational(t), s"h52 mismatch for '$t'")
    }
  }

  test("final streaming snapshot equals batch hllSummary registers per group") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val groups = 4
    val tokens = (0 until 6000).map(i => s"word_${i % 1700}")
    val stream = MemoryStream[String]
    val out = StreamingNdv.ndv(stream.toDS(), groups)
    val query = SourceKit.Sinks.toMemory(out.toDF(), "ndv_snap")
    try {
      val (b1, b2) = tokens.splitAt(tokens.length / 2)
      stream.addData(b1); query.processAllAvailable()
      stream.addData(b2); query.processAllAvailable()
      val snaps = spark.table("ndv_snap")
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      // latest snapshot per group
      val latest = snaps.groupBy(_._1).map { case (g, ss) => g -> ss.maxBy(_._2) }
      val batch = Profiling.hllSummary(
          tokens.map(t => (math.floorMod(t.hashCode, groups), t)).toDF("g", "tok"),
          "g", "tok")
        .collect()
        .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(latest.keySet == batch.keySet)
      latest.foreach { case (g, (_, _, hit, sumR, z)) =>
        assert((hit, sumR, z) == batch(g), s"group $g registers diverge")
      }
    } finally query.stop()
  }

  test("estimate tracks cumulative distinct count across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    val out = StreamingNdv.ndv(stream.toDS(), groups = 1)
    val query = SourceKit.Sinks.toMemory(out.toDF(), "ndv_grow")
    try {
      stream.addData((0 until 3000).map(i => s"a_$i")); query.processAllAvailable()
      stream.addData((0 until 3000).map(i => s"b_$i")); query.processAllAvailable()
      val byBatch = spark.table("ndv_grow").collect()
        .map(r => r.getLong(1) -> r.getDouble(5)).toMap
      assert(math.abs(byBatch(1L) - 3000) / 3000.0 < 0.1, s"batch1 ${byBatch(1L)}")
      assert(math.abs(byBatch(2L) - 6000) / 6000.0 < 0.1, s"batch2 ${byBatch(2L)}")
    } finally query.stop()
  }
}
