package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase
import graft.streaming.SourceKit.Sinks

case class RawDoc(doc_id: Long, text: String, source: String, ts: Timestamp)

class StreamingCurationSpec extends SparkTestBase {

  private val goodText =
    "the quick brown fox jumps over the lazy dog and keeps running through a field of tall grass"

  private def doc(id: Long, minute: Long, text: String): RawDoc =
    RawDoc(id, text, "src", new Timestamp((minute + 1) * 60000L))

  test("streaming curation: quality/language gates, PII scrub, cross-batch dedup, fingerprint") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[RawDoc]
    val out = StreamingCuration.curate(stream.toDF(), "ts", "30 minutes")
      .select("doc_id", "redacted", "fingerprint")
    val query = Sinks.toMemory(out, "cur_trace")
    try {
      stream.addData(
        doc(1, 0, goodText),
        doc(2, 1, goodText + " contact me at alice@example.com or 10.1.2.3"),
        doc(3, 2, "short junk"), // fails min-token quality gate
        doc(4, 3, "zz xx qq ww rr tt yy uu ii oo pp aa ss dd ff gg")) // no English markers
      query.processAllAvailable()
      stream.addData(
        doc(5, 10, goodText), // cross-batch duplicate of doc 1 -> dropped
        doc(6, 11, goodText + " a second genuinely new document body"))
      query.processAllAvailable()

      val got = Sinks.collected[(Long, String, Long)](spark, "cur_trace")
      assert(got.map(_._1).sorted == Seq(1L, 2L, 6L), s"got $got")
      val redacted2 = got.find(_._1 == 2L).get._2
      assert(redacted2.contains("[EMAIL]") && redacted2.contains("[IP]"))
      assert(!redacted2.contains("alice@example.com") && !redacted2.contains("10.1.2.3"))
      // fingerprints are the batch rollingFingerprint values (same expression)
      val fps = got.map(t => t._1 -> t._3).toMap
      assert(fps(1L) != fps(2L) && fps(1L) != fps(6L))
    } finally query.stop()
  }

  test("streaming curation output matches the equivalent batch expression pipeline") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = (0 until 50).map(i =>
      doc(i, i, goodText + s" unique suffix token$i"))
    val stream = MemoryStream[RawDoc]
    val out = StreamingCuration.curate(stream.toDF(), "ts", "1 hour")
      .select("doc_id", "fingerprint")
    val query = Sinks.toMemory(out, "cur_batch_eq")
    try {
      stream.addData(docs)
      query.processAllAvailable()
      val streaming = Sinks.collected[(Long, Long)](spark, "cur_batch_eq").sorted

      import org.apache.spark.sql.functions._
      val batch = docs.toDF()
        .withColumn("fingerprint",
          graft.functions.Portable.rollingFingerprint(
            graft.functions.Portable.tokens(col("text"))))
        .select(col("doc_id"), col("fingerprint"))
        .as[(Long, Long)].collect().toSeq.sorted
      assert(streaming == batch)
    } finally query.stop()
  }

  test("optional bitmap stage drops exactly the batch-quarantined docs") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.Dedup

    // one batch-quarantined doc (every-13th docs are self-contaminated:
    // their 8-token prefix IS a benchmark item) and one batch-kept doc,
    // with their REAL corpus texts
    val decisions = Dedup.decontaminateBloomBitmap(spark, sf0001)
      .select("doc_id", "action").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val qId = decisions.collectFirst { case (id, "quarantine") => id }.get
    val kId = decisions.collectFirst { case (id, "keep") => id }.get
    val texts = graft.Tables.documents(spark, sf0001)
      .filter(org.apache.spark.sql.functions.col("doc_id").isin(qId, kId))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val feed = Seq(doc(qId, 0, texts(qId)), doc(kId, 1, texts(kId)))

    def run(bitmap: Option[Array[Byte]], sink: String): Set[Long] = {
      val stream = MemoryStream[RawDoc]
      val out = StreamingCuration
        .curate(stream.toDF(), "ts", "1 hour", bitmap = bitmap)
        .select("doc_id")
      val query = Sinks.toMemory(out, sink)
      try {
        stream.addData(feed); query.processAllAvailable()
        Sinks.collected[Long](spark, sink).toSet
      } finally query.stop()
    }

    val without = run(None, "cur_nobm")
    assert(without == Set(qId, kId),
      s"both real docs must pass the quality/language gates; got $without")
    val withBm = run(Some(Dedup.benchmarkBitmap(spark, sf0001)), "cur_bm")
    assert(withBm == Set(kId), s"bitmap must drop exactly $qId; got $withBm")
  }
}
