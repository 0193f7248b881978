package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.SparkTestBase
import graft.functions.TextAnalysis
import graft.streaming.SourceKit.Sinks

/** Pins streaming token-budget admission to the oracle-gated batch form:
  * the same documents fed across two micro-batches (doc_id order per
  * source preserved, the contract) must reproduce
  * `TextAnalysis.tokenBudgetMix` row for row — n_tokens, cum_tokens and
  * the admit/overflow decision — including sources whose budget is
  * crossed in batch 1 and whose batch-2 docs must all overflow off the
  * carried state.
  */
class StreamingTokenBudgetSpec extends SparkTestBase {

  test("streaming admissions equal the batch token_budget_mix gate, cross-batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val expected = TextAnalysis.tokenBudgetMix(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSet
    assert(expected.exists(_._5 == "overflow"), "regime check: budget must bind")
    assert(expected.exists(_._5 == "admit"))

    val docs = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)].collect().sortBy(_._1)
      .map(t => StreamingTokenBudget.DocIn(t._1, t._2, t._3))
    // global doc_id split preserves per-source doc_id order across batches
    val (b1, b2) = docs.splitAt(docs.length / 2)

    val stream = MemoryStream[StreamingTokenBudget.DocIn]
    val out = StreamingTokenBudget.admissions(stream.toDS())
    val query = Sinks.toMemory(out, "budget_trace")
    try {
      stream.addData(b1.toIndexedSeq); query.processAllAvailable()
      stream.addData(b2.toIndexedSeq); query.processAllAvailable()
      val got = Sinks.collected[(Long, String, Long, Long, String)](
        spark, "budget_trace").toSet
      assert(got === expected)
    } finally query.stop()
  }

  test("TRAINED-unit streaming admissions equal the batch token_budget_trained gate") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val expected = TextAnalysis.tokenBudgetTrained(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSet
    assert(expected.exists(_._5 == "overflow") && expected.exists(_._5 == "admit"),
      "regime check: trained budget must bind")

    // the frozen training-time artifact, shipped in the closure
    val merges = TextAnalysis.trainedMerges(spark, sf0001)
    val docs = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)].collect().sortBy(_._1)
      .map(t => StreamingTokenBudget.DocIn(t._1, t._2, t._3))
    val (b1, b2) = docs.splitAt(docs.length / 2)

    val stream = MemoryStream[StreamingTokenBudget.DocIn]
    val out = StreamingTokenBudget.admissionsTrained(stream.toDS(), merges)
    val query = Sinks.toMemory(out, "budget_trained_trace")
    try {
      stream.addData(b1.toIndexedSeq); query.processAllAvailable()
      stream.addData(b2.toIndexedSeq); query.processAllAvailable()
      val got = Sinks.collected[(Long, String, Long, Long, String)](
        spark, "budget_trained_trace").toSet
      assert(got === expected,
        s"trained-unit divergence, e.g. ${(got -- expected).take(3)}")
    } finally query.stop()
  }
}
