package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}
import graft.streaming.SourceKit.Sinks
import graft.streaming.StreamingProfile.PEv

/** Composite-state live profile (transformWithState MapState + two
  * ValueStates): the latest snapshot per (user, type) after an
  * in-order cross-batch feed equals the batch aggregate over the same
  * events — count per (user, type), lifetime cents per user, last
  * event µs per user.
  */
class StreamingProfileSpec extends SparkTestBase {

  test("latest profile snapshots == batch count/sum/max aggregate, cross-batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val evs = Tables.events(spark, sf0001)
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
          (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
        .as[PEv].collect()
        .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
      val stream = MemoryStream[PEv]
      val out = StreamingProfile.profiles(stream.toDS())
      val q = Sinks.toMemory(out.toDF(), "profile_out")
      try {
        val (b1, b2) = evs.toIndexedSeq.splitAt(evs.length / 2)
        stream.addData(b1); q.processAllAvailable()
        stream.addData(b2); q.processAllAvailable()
        // latest snapshot per (user, type): n is strictly increasing
        val latest = spark.table("profile_out")
          .groupBy("user_id", "event_type")
          .agg(max(struct(col("n"), col("user_cents"), col("last_us"))).as("s"))
          .select(col("user_id"), col("event_type"),
            col("s.n"), col("s.user_cents"), col("s.last_us"))
          .collect()
          .map(r => (r.getLong(0), r.getString(1)) ->
            (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
        // batch truth over the same rows
        val byUser = evs.groupBy(_.user_id)
        val expected = evs.groupBy(e => (e.user_id, e.event_type)).map {
          case ((u, t), es) =>
            val all = byUser(u)
            (u, t) -> (es.size.toLong, all.map(_.cents).sum,
              all.map(e => TsUtil.micros(e.ts)).max)
        }
        assert(latest.nonEmpty && latest == expected,
          s"profile drift: ${(latest.toSet diff expected.toSet).take(3)}")
      } finally q.stop()
    } finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  test("warm start: batch backfill + streamed tail == batch aggregate over everything") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val evs = Tables.events(spark, sf0001)
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
          (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
        .as[PEv].collect()
        .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
      val (backfill, tail) = evs.toIndexedSeq.splitAt(evs.length / 2)
      // the backfill init rows, exactly as a batch aggregate produces
      // them: per (user, type) count + user-level totals
      def aggregate(rows: Seq[PEv]): Map[(Long, String), (Long, Long, Long)] = {
        val byUser = rows.groupBy(_.user_id)
        rows.groupBy(e => (e.user_id, e.event_type)).map { case ((u, t), es) =>
          val all = byUser(u)
          (u, t) -> (es.size.toLong, all.map(_.cents).sum,
            all.map(e => TsUtil.micros(e.ts)).max)
        }
      }
      val init = aggregate(backfill).toSeq.map { case ((u, t), (n, c, l)) =>
        StreamingProfile.ProfileRow(u, t, n, c, l)
      }
      val stream = MemoryStream[PEv]
      val out = StreamingProfile.profilesFrom(
        stream.toDS(), s.createDataset(init))
      val q = Sinks.toMemory(out.toDF(), "profile_warm")
      try {
        stream.addData(tail); q.processAllAvailable()
        val latest = spark.table("profile_warm")
          .groupBy("user_id", "event_type")
          .agg(max(struct(col("n"), col("user_cents"), col("last_us"))).as("s"))
          .select(col("user_id"), col("event_type"),
            col("s.n"), col("s.user_cents"), col("s.last_us"))
          .collect()
          .map(r => (r.getLong(0), r.getString(1)) ->
            (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
        // users active in the streamed tail must show the FULL-history
        // profile (backfill counts chained through the initial state)
        val tailUsers = tail.map(_.user_id).toSet
        val expected = aggregate(evs.toIndexedSeq)
          .filter { case ((u, _), _) => tailUsers(u) }
        assert(latest.nonEmpty && latest == expected,
          s"warm-start drift: ${(latest.toSet diff expected.toSet).take(3)}")
      } finally q.stop()
    } finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }
}
