package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}
import graft.operators.Relational
import graft.streaming.SourceKit.Sinks

class CountWindowsSpec extends SparkTestBase {

  test("keyed count windows of 2: complete windows emit, incomplete buffer persists across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[KV]
    def kv(k: String, v: Int): KV = KV(k, v)
    val out = CountWindows.keyed(stream.toDS(), size = 2)(_.k, _.v.toLong) {
      (k, items) => (k, items.map(_.v).sum, items.map(_.v).mkString("-"))
    }
    val query = Sinks.toMemory(out, "cw_trace")
    try {
      stream.addData(kv("a", 1), kv("a", 2), kv("a", 3), kv("b", 4), kv("b", 5))
      query.processAllAvailable()
      // a: window (1,2); 3 buffered. b: window (4,5).
      var got = Sinks.collected[(String, Int, String)](spark, "cw_trace").toSet
      assert(got == Set(("a", 3, "1-2"), ("b", 9, "4-5")), s"got $got")

      stream.addData(kv("a", 4)) // completes the buffered window (3,4)
      query.processAllAvailable()
      got = Sinks.collected[(String, Int, String)](spark, "cw_trace").toSet
      assert(got.contains(("a", 7, "3-4")), s"buffered window did not complete: $got")
      assert(got.size == 3, "incomplete windows must never emit")
    } finally query.stop()
  }

  test("global count window runs single-key (reference countWindowAll semantics)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[KV]
    val out = CountWindows.global(stream.toDS(), size = 3)(_.v.toLong)(
      items => items.map(_.v).sum)
    val query = Sinks.toMemory(out, "cw_global")
    try {
      stream.addData(KV("x", 1), KV("y", 2), KV("z", 3), KV("w", 4))
      query.processAllAvailable()
      val got = Sinks.collected[Int](spark, "cw_global")
      assert(got == Seq(6), s"got $got") // (1,2,3) emits; 4 buffered forever
    } finally query.stop()
  }

  test("streaming count windows == batch row_number bucketing oracle (q13)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val evs = Tables.events(spark, sf0001)
      .select(
        col("event_id"), col("user_id"), col("ts"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .as[Ev].collect()

    val stream = MemoryStream[Ev]
    // order within key by (ts, event_id) — exactly the oracle's window order
    val out = CountWindows.keyed(stream.toDS(), size = 2)(
      _.user_id, e => TsUtil.micros(e.ts), _.event_id)(
      (k, items) => (k, items.map(_.cents).sum))
    val query = Sinks.toMemory(out, "cw_vs_batch")
    try {
      stream.addData(evs.toIndexedSeq)
      query.processAllAvailable()
      val streaming = Sinks.collected[(Long, Long)](spark, "cw_vs_batch")
        .sorted
      val batch = Relational.q13CountWindow(spark, sf0001)
        .select(col("user_id"), round(col("sum_value") * 100).cast("long"))
        .as[(Long, Long)].collect().toSeq.sorted
      assert(streaming == batch, s"sizes ${streaming.size} vs ${batch.size}; " +
        s"first diff: ${streaming.zip(batch).find(p => p._1 != p._2)}")
    } finally query.stop()
  }

  test("keyedTws: transformWithState twin == GroupState form on the q13 corpus, cross-batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    // differential pin (VERDICT r18 item 6, the MapWithStateTWSSpec
    // pattern): identical outputs on identical two-batch feeds — the
    // batch split lands mid-buffer for many keys, so the cross-batch
    // buffered-prefix handoff is exercised, not just the happy path.
    // transformWithState requires the RocksDB provider; both forms run
    // under it so the comparison is provider-identical.
    val evs = Tables.events(spark, sf0001)
      .select(
        col("event_id"), col("user_id"), col("ts"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .as[Ev].collect()
      .sortBy(e => (TsUtil.micros(e.ts), e.event_id))

    def run(tag: String, tws: Boolean): Seq[(Long, Long)] = {
      val stream = MemoryStream[Ev]
      val ds = stream.toDS()
      val out =
        if (tws) CountWindows.keyedTws(ds, size = 2)(
          _.user_id, e => TsUtil.micros(e.ts), _.event_id)(
          (k, items) => (k, items.map(_.cents).sum))
        else CountWindows.keyed(ds, size = 2)(
          _.user_id, e => TsUtil.micros(e.ts), _.event_id)(
          (k, items) => (k, items.map(_.cents).sum))
      val query = Sinks.toMemory(out, tag)
      try {
        val (first, second) = evs.splitAt(evs.length / 2)
        stream.addData(first.toIndexedSeq); query.processAllAvailable()
        stream.addData(second.toIndexedSeq); query.processAllAvailable()
        Sinks.collected[(Long, Long)](spark, tag).sorted
      } finally query.stop()
    }

    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val groupState = run("cw_diff_gs", tws = false)
      val tws = run("cw_diff_tws", tws = true)
      assert(tws.nonEmpty && tws == groupState,
        s"TWS count windows diverged: ${tws.size} rows vs ${groupState.size}")
    } finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }
}
