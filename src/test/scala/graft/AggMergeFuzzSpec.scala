package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.expressions._

/** Merge-order invariance fuzz across ALL TypedImperativeAggregates
  * (VERDICT r14 item 6): task retries, AQE partition-count changes and
  * shuffle nondeterminism permute both UPDATE order and the MERGE tree
  * — a gate hash must be a pure function of the input MULTISET. Every
  * aggregate is evaluated under a sweep of partition counts, partition
  * keys and row orders, and all variants must agree bit-for-bit (via
  * md5(to_json(result))).
  *
  * Regime note: TopK/Quantile sketches are exercised in their
  * EXACT regime (capacity >= distinct items / group size), which is
  * the regime every gate runs them in — approximate-regime outputs are
  * legitimately merge-order-dependent and are bounded by their own
  * error specs (TopKSketchSpec, QuantileSketchSpec) instead.
  */
class AggMergeFuzzSpec extends SparkTestBase {

  private val BloomBits = 1 << 12

  /** Deterministic fuzz corpus: 3 groups x 2000 rows of hashes,
    * positions, tokens (30-word vocab, well under capacity 64) and
    * values (sketch capacity 4096 > any group). */
  private lazy val corpus: DataFrame = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(1515)
    (1 to 6000).map { i =>
      val g = rnd.nextInt(3).toLong
      val h = rnd.nextLong() & 0x7fffffffffffffffL
      val h2 = rnd.nextLong() & 0x7fffffffffffffffL
      val pos = (rnd.nextInt(BloomBits)).toLong
      val tok = s"w${rnd.nextInt(30)}"
      val v = rnd.nextInt(1000).toDouble
      (g, h, h2, pos, tok, v, i.toLong)
    }.toDF("g", "h", "h2", "pos", "tok", "v", "seq")
  }

  /** The shuffled-partitioning sweep: different partition counts (each
    * a different partial-agg grouping => different merge tree),
    * different partition keys, and scrambled row orders. */
  private def variants(df: DataFrame): Seq[(String, DataFrame)] = Seq(
    "p1"        -> df.coalesce(1),
    "p5"        -> df.repartition(5),
    "p32"       -> df.repartition(32),
    "byG"       -> df.repartition(11, col("g")),
    "scrambled" -> df.orderBy(rand(7)).repartition(13),
    "descSeq"   -> df.orderBy(col("seq").desc).repartition(3, col("pos")))

  private def fingerprints(df: DataFrame, agg: Column): Map[Long, String] =
    df.groupBy("g").agg(agg.as("res"))
      .select(col("g"), expr("md5(to_json(named_struct('r', res)))").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  private def sweep(name: String, agg: Column): Unit = {
    val all = variants(corpus).map { case (vn, df) => vn -> fingerprints(df, agg) }
    val (refName, ref) = all.head
    assert(ref.size == 3, s"$name: expected 3 groups, got ${ref.keySet}")
    all.tail.foreach { case (vn, got) =>
      assert(got == ref,
        s"$name: variant $vn diverged from $refName — merge order moved the result")
    }
  }

  test("MinHashAgg is a pure function of the input multiset")(
    sweep("MinHashAgg", MinHashAgg(col("h"))))

  test("SimHashAgg is a pure function of the input multiset")(
    sweep("SimHashAgg", SimHashAgg(col("h"), col("h2"))))

  test("TopKSketchAgg (exact regime) is a pure function of the input multiset")(
    sweep("TopKSketchAgg", TopKSketchAgg(col("tok"), capacity = 64, k = 10)))

  test("QuantileSketchAgg (exact regime) is a pure function of the input multiset")(
    sweep("QuantileSketchAgg",
      QuantileSketchAgg(col("v"), capacity = 4096, fractions = Seq(0.1, 0.5, 0.9))))

  test("BloomBitmapAgg is a pure function of the input multiset")(
    sweep("BloomBitmapAgg", BloomBitmapAgg(col("pos"), BloomBits)))
}
