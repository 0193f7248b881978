package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Trained BPE: the merge table is a deterministic pure function of the
  * corpus (tie rule included), the Catalyst fold column replays the
  * driver fold exactly, and the encoder is consistent with the trainer
  * (training words re-encode to their trained tokenizations).
  */
class BpeSpec extends SparkTestBase {

  test("trainer determinism: same words -> same merges; ties break lexicographically") {
    val words = Seq(("banana", 3L), ("bandana", 2L), ("cabana", 1L))
    val m1 = TextAnalysis.trainBpe(words, 8)
    val m2 = TextAnalysis.trainBpe(words, 8)
    assert(m1 == m2 && m1.length == 8)
    // shuffled input order must not move the table (map-based counts,
    // total-order argmin)
    val m3 = TextAnalysis.trainBpe(words.reverse, 8)
    assert(m3 == m1)
    // pure tie case: "ab" and "cd" both count 1 -> (a,b) wins lexicographically
    val tied = TextAnalysis.trainBpe(Seq(("ab", 1L), ("cd", 1L)), 1)
    assert(tied == Seq(("a", "b")))
    // weighted: "cd" at count 2 beats "ab" at count 1
    val weighted = TextAnalysis.trainBpe(Seq(("ab", 1L), ("cd", 2L)), 1)
    assert(weighted == Seq(("c", "d")))
  }

  test("mergePass: left-to-right non-overlapping, cascade-safe") {
    import TextAnalysis.mergePass
    def v(s: String*) = s.toVector
    assert(mergePass(v("a", "a", "a"), "a", "a") == v("aa", "a"))
    assert(mergePass(v("a", "a", "a", "a"), "a", "a") == v("aa", "aa"))
    assert(mergePass(v("a", "b", "c"), "a", "b") == v("ab", "c"))
    // a merged symbol never re-matches the pair's left side mid-pass
    assert(mergePass(v("a", "b", "b"), "a", "b") == v("ab", "b"))
    assert(mergePass(v("x"), "a", "b") == v("x"))
  }

  test("Catalyst fold chain == driver fold on fuzzed words (the cross-engine algebra)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(15)
    val alpha = "abc"
    val words = (1 to 60).map(_ =>
      Seq.fill(1 + rnd.nextInt(12))(alpha(rnd.nextInt(alpha.length))).mkString).distinct
    val merges = TextAnalysis.trainBpe(words.map(w => (w, 1L)), 6)
    assert(merges.length == 6)
    // driver model: sequential mergePass over codepoint chars
    val model = words.map { w =>
      w -> merges.foldLeft(TextAnalysis.codepointChars(w)) {
        case (ts, (l, r)) => TextAnalysis.mergePass(ts, l, r)
      }
    }.toMap
    // Spark side: the same chain through the production fold column
    val enc = TextAnalysis.encodeWithMerges(
      words.toDF("w"), merges)
    val got = enc.select(col("w"), col("toks")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    assert(got == model, s"fold divergence: ${got.toSeq.diff(model.toSeq).take(3)}")
  }

  test("native BpeTrainedCount expression == batch gate per document") {
    // the streaming-shaped per-row eval (pretokenize + fold + memo)
    // against the batch distinct-pretoken/broadcast-join path — same
    // merge table, so any divergence is an encoder bug
    val merges = TextAnalysis.trainedMerges(spark, sf0001)
    val exprRows = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"),
        graft.functions.expressions.BpeTrainedCount(col("text"), merges).as("c"))
      .select(col("doc_id"), col("c.n_pretokens"), col("c.n_bpe_trained"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batchRows = TextAnalysis.bpeTrainedCounts(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(exprRows == batchRows,
      s"per-row encoder diverges from batch, e.g. ${(exprRows -- batchRows).take(3)}")
  }

  test("codepoint split keeps surrogate pairs whole") {
    val w = "a😀b" // a, U+1F600, b
    assert(TextAnalysis.codepointChars(w) == Vector("a", "😀", "b"))
  }

  test("gate shapes: 24 merges, counts bounded by pretokens") {
    val merges = TextAnalysis.bpeMerges(spark, sf0001).collect()
    assert(merges.length == TextAnalysis.BpeMerges)
    assert(merges.map(_.getLong(0)).toSeq == (1L to 24L))
    val counts = TextAnalysis.bpeTrainedCounts(spark, sf0001).collect()
    assert(counts.length == 500)
    // merges only ever SHRINK a pretoken's token count, and a token
    // count is at least the pretoken count (every pretoken >= 1 token)
    counts.foreach { r =>
      val (np, nb) = (r.getLong(1), r.getLong(2))
      assert(nb >= np, s"doc ${r.getLong(0)}: $nb trained tokens < $np pretokens")
    }
    // and the trained count is strictly below the raw character count
    // somewhere (the merges actually fired)
    val chars = graft.Tables.documents(spark, sf0001)
      .select(sum(length(col("text")))).collect()(0).getLong(0)
    assert(counts.map(_.getLong(2)).sum < chars)
  }
}
