package graft.examples

import scala.concurrent.duration._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.{CountWindows, MapWithStateTTL, RunningReduce}
import graft.streaming.SourceKit.{Script, Sinks}

/** Runnable tour of the streaming surface — the reference's
  * MapWithStateIterPoC `main` reimagined (SURVEY EP2): scripted source →
  * TTL-evicted per-key running sum → labeled sinks, plus count windows and
  * running reduce on the same stream. `sbt "runMain graft.examples.StreamingDemo"`.
  */
object StreamingDemo {
  case class KV(k: String, v: Int)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-streaming-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // --- TTL-evicted running sum (the reference's flagship, C1/C5) ---
    // NOTE: processing-time TTL measures wall-clock between batch trigger
    // times — the cold first micro-batch alone can take 2-3 s in local
    // mode, so the ttl must comfortably exceed batch latency (same
    // reasoning as SURVEY §7.3 "generous ttl vs batch cadence").
    val ttlStream = MemoryStream[KV]
    val ttlOut = MapWithStateTTL.processingTime(
      ttlStream.toDS(), ttl = 6.seconds, defaultState = 0)(_.k) {
      (k, in, sum) => val s2 = sum + in.v; ((k, s2), s2)
    }
    val ttlQuery = Sinks.toMemory(ttlOut, "demo_ttl", triggerInterval = Some("100 milliseconds"))
    Script.empty[KV]
      .addElem(KV("a", 2)).addElem(KV("b", 1))
      .addGap(300.millis)
      .addElem(KV("a", 3))       // within ttl: a -> 5
      .addGap(8.seconds)         // > ttl: state evicted
      .addElem(KV("a", 3))       // fresh cycle: a -> 3
      .playByCount(ttlStream, spark, "demo_ttl")
    println("TTL-evicted running sums (expect a: 2,5 then fresh 3):")
    spark.table("demo_ttl").show(truncate = false)
    ttlQuery.stop()

    // --- keyed count windows of 2 (C14/B17) ---
    val cwStream = MemoryStream[KV]
    val cwOut = CountWindows.keyed(cwStream.toDS(), size = 2)(_.k, _.v.toLong) {
      (k, items) => (k, items.map(_.v).sum)
    }
    val cwQuery = Sinks.toMemory(cwOut, "demo_cw")
    cwStream.addData(KV("a", 1), KV("a", 2), KV("a", 9), KV("b", 4), KV("b", 5))
    cwQuery.processAllAvailable()
    println("Count windows of 2 (a:(1,2)->3, b:(4,5)->9; a's 9 stays buffered):")
    spark.table("demo_cw").show(truncate = false)
    cwQuery.stop()

    // --- keyed running reduce, per-event emission (B10) ---
    val rrStream = MemoryStream[KV]
    val rrOut = RunningReduce.keyed(rrStream.toDS(), zero = 0)(_.k, _.v.toLong)(
      (acc, in) => acc + in.v)
    val rrQuery = Sinks.toMemory(rrOut, "demo_rr")
    rrStream.addData(KV("a", 1), KV("a", 3), KV("a", 8))
    rrQuery.processAllAvailable()
    println("Running reduce (expect a: 1,4,12):")
    spark.table("demo_rr").show(truncate = false)
    rrQuery.stop()

    // --- live conversion funnel (keyed funnel state, round 12) ---
    import graft.streaming.StreamingTransitions.Ev
    def ev(sec: Long, id: Long, tpe: String) =
      Ev(1L, new java.sql.Timestamp(sec * 1000), id, tpe)
    val fStream = MemoryStream[Ev]
    val fOut = graft.streaming.StreamingFunnel.stages(fStream.toDS())
    val fQuery = Sinks.toMemory(fOut.toDF(), "demo_funnel")
    fStream.addData(
      ev(1, 1, "view"), ev(2, 2, "click"), ev(3, 3, "purchase"),
      ev(4, 4, "click")) // second click: funnel already advanced, no row
    fQuery.processAllAvailable()
    println("Funnel stages (expect user, view, click_after_view, purchase_after_click):")
    spark.table("demo_funnel").show(truncate = false)
    fQuery.stop()

    // --- live last-touch attribution (one Touch per user, round 12) ---
    val aStream = MemoryStream[Ev]
    val aOut = graft.streaming.StreamingAttribution.hits(aStream.toDS())
    val aQuery = Sinks.toMemory(aOut.toDF(), "demo_attr")
    aStream.addData(
      ev(1, 1, "purchase"), // before any touch -> none
      ev(2, 2, "click"), ev(5, 3, "purchase"), // -> click, lag 3 s
      ev(6, 4, "view"), ev(9, 5, "purchase")) // view re-points -> view, lag 3 s
    aQuery.processAllAvailable()
    println("Attribution (expect none/0, click/3, view/3):")
    spark.table("demo_attr").show(truncate = false)
    aQuery.stop()

    // --- live journey 3-grams (two-string suffix state, round 13) ---
    val pStream = MemoryStream[Ev]
    val pOut = graft.streaming.StreamingPaths.paths(pStream.toDS())
    val pQuery = Sinks.toMemory(pOut.toDF(), "demo_paths")
    pStream.addData(
      ev(1, 1, "view"), ev(2, 2, "view"), ev(3, 3, "click"),
      ev(4, 4, "purchase"))
    pQuery.processAllAvailable()
    println("Journey paths (expect view,view,click then view,click,purchase):")
    spark.table("demo_paths").show(truncate = false)
    pQuery.stop()

    // --- composite-state live profile on transformWithState (round 13;
    //     the API requires the RocksDB state store provider) ---
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import graft.streaming.StreamingProfile.PEv
    def pev(sec: Long, id: Long, tpe: String, cents: Long) =
      PEv(id, 1L, new java.sql.Timestamp(sec * 1000), tpe, cents)
    val prStream = MemoryStream[PEv]
    val prOut = graft.streaming.StreamingProfile.profiles(prStream.toDS())
    val prQuery = Sinks.toMemory(prOut.toDF(), "demo_profile")
    prStream.addData(
      pev(1, 1, "view", 0), pev(2, 2, "view", 0), pev(3, 3, "purchase", 1999))
    prQuery.processAllAvailable()
    println("Live profile (expect view n=2 and purchase n=1, both with user_cents 1999):")
    spark.table("demo_profile").show(truncate = false)
    prQuery.stop()

    spark.stop()
  }
}
