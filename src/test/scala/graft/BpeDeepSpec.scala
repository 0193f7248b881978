package graft

import org.apache.spark.sql.functions._

import graft.functions.{BpeCodec, TextAnalysis}
import graft.functions.expressions.BpeEncodedLen

/** The scalable BPE encode (BpeCodec's lowest-rank-present loop, the
  * `BpeEncodedLen` batch kernel) equals the rank-order fold the gates
  * pin — driver form AND nested-HOF Catalyst form — on deep trained
  * tables, and the codec refuses tables where the equivalence argument
  * doesn't hold.
  */
class BpeDeepSpec extends SparkTestBase {

  /** A deep-ish trained table from the sf0.001 corpus vocabulary —
    * trained by the production trainer, so the rank-monotone property
    * the codec validates holds by construction. */
  private lazy val deep: (Seq[(String, String)], Seq[String]) = {
    val s = spark
    import s.implicits._
    val pre = graft.Tables.documents(spark, sf0001)
      .select(explode(regexp_extract_all(col("text"),
        lit(TextAnalysis.BpePretokenPattern), lit(0))).as("w"))
    val top = pre.groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc).limit(512)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // the synthetic corpus dictionary (~61 pretokens) exhausts around
    // 127 rules — train within that so the table is full-rank
    val merges = TextAnalysis.trainBpe(top, 120)
    assert(merges.length == 120, s"vocab exhausted at ${merges.length}")
    (merges, pre.distinct().as[String].collect().toSeq)
  }

  test("codec lowest-rank loop == driver rank-order fold on every distinct pretoken") {
    val (merges, words) = deep
    val codec = BpeCodec(merges)
    words.foreach { w =>
      val fold = merges.foldLeft(TextAnalysis.codepointChars(w)) {
        case (ts, (l, r)) => TextAnalysis.mergePass(ts, l, r)
      }
      assert(codec.encode(w) == fold, s"codec diverges from the fold on '$w'")
    }
  }

  test("BpeEncodedLen batch kernel == nested-HOF Catalyst fold on a deep table") {
    val s = spark
    import s.implicits._
    val (merges, words) = deep
    // HOF chain depth scales with the merge count — cap this pin at 64
    // rules (8 checkpoint barriers); the codec-vs-driver-fold pin above
    // covers the full 200
    val head = merges.take(64)
    val df = words.toDF("w")
    val hof = TextAnalysis.encodeWithMerges(df, head)
      .select(col("w"), size(col("toks")).cast("long").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val native = df.select(col("w"), BpeEncodedLen(col("w"), head).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(native == hof,
      s"native kernel diverges from the HOF fold, e.g. ${
        native.toSeq.diff(hof.toSeq).take(3)}")
  }

  test("a generated 1024-rule table: codec == driver fold (thousands-of-merges capability)") {
    // the gate corpora's fixed dictionary can't exhaust-proof a deep
    // table, so generate a big vocabulary and train a genuinely deep
    // table with the production trainer — the codec must replay the
    // rank-order fold exactly at this depth, at K-independent cost
    val rnd = new scala.util.Random(16)
    val alpha = "abcdefghijklmnopqrst"
    val words = Iterator.continually(
        Seq.fill(4 + rnd.nextInt(9))(alpha(rnd.nextInt(alpha.length))).mkString)
      .distinct.take(1500).toVector
    val merges = TextAnalysis.trainBpe(words.map(w => (w, 1L)), 1024)
    assert(merges.length == 1024, s"vocab exhausted at ${merges.length}")
    val codec = BpeCodec(merges)
    words.foreach { w =>
      val fold = merges.foldLeft(TextAnalysis.codepointChars(w)) {
        case (ts, (l, r)) => TextAnalysis.mergePass(ts, l, r)
      }
      assert(codec.encode(w) == fold, s"1024-rule divergence on '$w'")
    }
  }

  test("deep geometry merges strictly beyond the gate table and shrinks counts further") {
    val (merges, words) = deep
    assert(merges.length > TextAnalysis.BpeMerges)
    val codec = BpeCodec(merges)
    val gateCodec = BpeCodec(TextAnalysis.trainBpe(
      words.map(w => (w, 1L)), TextAnalysis.BpeMerges))
    val deepTotal = words.map(codec.encodedLen).sum
    val gateTotal = words.map(gateCodec.encodedLen).sum
    assert(deepTotal < gateTotal,
      s"200 rules ($deepTotal tokens) should compress beyond 24 ($gateTotal)")
  }

  test("codec refuses non-rank-monotone tables (the equivalence precondition)") {
    // 'xy' appears as a rule side without an earlier (x, y) rule — a
    // hand-built table the lowest-rank loop is NOT proven equal on
    val bad = Seq(("xy", "z"))
    val e = intercept[IllegalArgumentException](BpeCodec(bad))
    assert(e.getMessage.contains("rank-monotone"))
    // an exactly-duplicated rule refuses (caught by the product check)
    val dup = Seq(("a", "b"), ("a", "b"))
    assert(intercept[IllegalArgumentException](BpeCodec(dup))
      .getMessage.contains("same symbol"))
    // duplicate PRODUCTS refuse: (a,bc) and (ab,c) both make "abc", so
    // a rule keyed on "abc" could see it created by EITHER — the
    // rank-order argument breaks (see scaladoc); the codec must refuse
    // rather than risk loop≠fold
    val dupProduct = Seq(("b", "c"), ("a", "bc"), ("a", "b"), ("ab", "c"))
    assert(intercept[IllegalArgumentException](BpeCodec(dupProduct))
      .getMessage.contains("same symbol"))
    // and the happy path builds: each side single-codepoint or produced
    BpeCodec(Seq(("x", "y"), ("xy", "z")))
  }

  test("codec handles degenerate inputs") {
    val codec = BpeCodec(Seq(("a", "a"), ("aa", "a")))
    assert(codec.encode("") == Vector.empty)
    assert(codec.encode("b") == Vector("b"))
    assert(codec.encode("aaa") == Vector("aaa")) // (a,a) then (aa,a)
    assert(codec.encode("aaaa") == Vector("aa", "aa")) // fold parity: no (aaa) overreach
    // fold model agrees on the cascade
    Seq("", "b", "a", "aa", "aaa", "aaaa", "aaaaa", "ba", "ab").foreach { w =>
      val fold = codec.merges.foldLeft(TextAnalysis.codepointChars(w)) {
        case (ts, (l, r)) => TextAnalysis.mergePass(ts, l, r)
      }
      assert(codec.encode(w) == fold, s"degenerate '$w'")
    }
  }
}
