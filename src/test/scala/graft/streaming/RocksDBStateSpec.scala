package graft.streaming

import scala.concurrent.duration._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase
import graft.streaming.SourceKit.Sinks

/** The 100 TB state posture (SURVEY §7.3): keyed state must be able to run
  * on the RocksDB state store provider (bounded memory, spill-to-disk)
  * rather than the default in-heap HDFS-backed map. This spec runs the
  * flagship TTL operator under RocksDB and checks the state survives
  * batches and evicts on timeout exactly as under the default provider.
  */
class RocksDBStateSpec extends SparkTestBase {

  test("MapWithStateTTL runs on the RocksDB state store provider") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[KV]
      val out = MapWithStateTTL.processingTime(
        stream.toDS(), ttl = 30.seconds, defaultState = 0)(_.k) {
        (k, in, sum) => val s2 = sum + in.v; ((k, s2), s2)
      }
      val query = Sinks.toMemory(out, "rocksdb_ttl", triggerInterval = Some("100 milliseconds"))
      try {
        stream.addData(KV("a", 1), KV("b", 2))
        // wait for the first rows, then accumulate across a second batch
        var deadline = System.currentTimeMillis + 30000
        while (spark.table("rocksdb_ttl").count() < 2 && System.currentTimeMillis < deadline)
          Thread.sleep(50)
        stream.addData(KV("a", 4))
        deadline = System.currentTimeMillis + 30000
        while (spark.table("rocksdb_ttl").count() < 3 && System.currentTimeMillis < deadline)
          Thread.sleep(50)
        val got = Sinks.collected[(String, Int)](spark, "rocksdb_ttl")
          .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
        assert(got("a") == Seq(1, 5), s"RocksDB-backed state did not accumulate: $got")
        assert(got("b") == Seq(2), s"got $got")
      } finally query.stop()
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
