package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.sketch.QuantileSketch

/** Properties of the mergeable quantile sketch: exactness below
  * capacity under arbitrary merge trees, bounded rank error in the
  * compacting regime, count conservation, and serialization fidelity.
  * (No SparkSession needed — the aggregate plumbing is exercised by the
  * approx_quantiles gate and ApproxSketchSpec-style usage in SQL.)
  */
class QuantileSketchSpec extends AnyFunSuite {

  private def nearestRank(sorted: IndexedSeq[Double], q: Double): Double =
    sorted((math.max(1L, math.ceil(q * sorted.size).toLong) - 1).toInt)

  private val fractions = Seq(0.0, 0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)

  test("exact below capacity: quantiles == nearest-rank truth under random merge trees") {
    val rnd = new Random(42)
    for (trial <- 1 to 5) {
      val n = 50 + rnd.nextInt(400)
      val values = IndexedSeq.fill(n)(rnd.nextDouble() * 1000 - 500)
      // random partials merged in a random tree, total below capacity
      var sketches = values.grouped(1 + rnd.nextInt(40)).map { chunk =>
        val sk = new QuantileSketch(512)
        chunk.foreach(sk.add)
        sk
      }.toVector
      while (sketches.size > 1) {
        val i = rnd.nextInt(sketches.size - 1)
        val merged = sketches(i).merge(sketches(i + 1))
        sketches = sketches.patch(i, Seq(merged), 2)
      }
      val sk = sketches.head
      assert(sk.n == n)
      assert(sk.size == n, "exact regime must not compact")
      val sorted = values.sorted
      for (q <- fractions)
        assert(sk.quantile(q) == nearestRank(sorted, q), s"trial $trial q=$q")
    }
  }

  test("compacting regime: rank error stays within 5% of n, state stays bounded") {
    val rnd = new Random(7)
    val n = 50000
    val capacity = 256
    val values = Array.fill(n)(rnd.nextDouble())
    val sk = new QuantileSketch(capacity)
    values.foreach(sk.add)
    assert(sk.n == n)
    assert(sk.rank(Double.MaxValue) == n, "compaction must conserve total weight")
    // state is O(capacity * levels), nowhere near n
    assert(sk.size <= capacity * sk.numLevels && sk.size < n / 20,
      s"retained ${sk.size} of $n")
    val sorted = values.sorted
    for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val est = sk.quantile(q)
      // true rank of the estimate vs the target rank
      val target = math.max(1L, math.ceil(q * n).toLong)
      val lo = sorted.count(_ < est)
      val hi = sorted.count(_ <= est)
      val err = if (target < lo) lo - target else if (target > hi) target - hi else 0L
      assert(err <= n * 0.05, s"q=$q: rank error $err (target $target, est in [$lo,$hi])")
    }
  }

  test("merge of compacted sketches conserves count and keeps the bound") {
    val rnd = new Random(13)
    val n = 60000
    val capacity = 256
    val values = Array.fill(n)(rnd.nextGaussian() * 100)
    val parts = values.grouped(n / 7).map { chunk =>
      val sk = new QuantileSketch(capacity)
      chunk.foreach(sk.add)
      sk
    }.toVector
    val merged = parts.reduce(_.merge(_))
    assert(merged.n == n)
    val sorted = values.sorted
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val est = merged.quantile(q)
      val target = math.max(1L, math.ceil(q * n).toLong)
      val lo = sorted.count(_ < est)
      val hi = sorted.count(_ <= est)
      val err = if (target < lo) lo - target else if (target > hi) target - hi else 0L
      assert(err <= n * 0.05, s"q=$q after merge: rank error $err")
    }
  }

  test("serialization round-trips mid-stream and merges after deserialize") {
    val rnd = new Random(99)
    val sk = new QuantileSketch(64)
    (1 to 10000).foreach(_ => sk.add(rnd.nextDouble()))
    val restored = QuantileSketch.deserialize(sk.serialized)
    assert(restored.n == sk.n)
    for (q <- fractions) assert(restored.quantile(q) == sk.quantile(q))
    // keep adding to the restored copy and merge with a fresh sketch
    val other = new QuantileSketch(64)
    (1 to 5000).foreach(_ => other.add(rnd.nextDouble()))
    val merged = restored.merge(other)
    assert(merged.n == 15000)
  }

  test("edge cases: empty, single element, all-equal values") {
    val empty = new QuantileSketch(16)
    assert(empty.quantile(0.5).isNaN)
    val one = new QuantileSketch(16)
    one.add(42.0)
    for (q <- fractions) assert(one.quantile(q) == 42.0)
    val flat = new QuantileSketch(16)
    (1 to 1000).foreach(_ => flat.add(7.5))
    for (q <- fractions) assert(flat.quantile(q) == 7.5)
    assert(flat.rank(7.5) == flat.n)
  }
}
