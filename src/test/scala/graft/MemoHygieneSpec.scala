package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.util.BoundedMemo

/** The shared bounded-memo contract every driver-side artifact cache
  * rides on (VERDICT r16 item 7 + ADVICE r16 on pcaFrameMemo's FIFO
  * eviction): LRU not FIFO, bounded, onEvict on every drop path. */
class MemoHygieneSpec extends AnyFunSuite {

  test("hit moves key to back: hot entry survives eviction (LRU, not FIFO)") {
    val m = new BoundedMemo[Int, String](3)
    (1 to 3).foreach(k => m.getOrElseUpdate(k)(s"v$k"))
    // touch the eldest — a FIFO cache would still evict it next
    m.getOrElseUpdate(1)(fail("touch must hit, not rebuild"))
    m.getOrElseUpdate(4)("v4") // evicts 2 (now the true LRU victim)
    assert(m.keysEldestFirst == List(3, 1, 4))
    m.getOrElseUpdate(1)(fail("hot key was evicted"))
    var rebuilt = false
    m.getOrElseUpdate(2) { rebuilt = true; "v2'" }
    assert(rebuilt, "2 should have been the eviction victim")
  }

  test("eviction and clear call onEvict exactly once per dropped entry") {
    val dropped = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    val m = new BoundedMemo[Int, String](2, (k, v) => dropped += ((k, v)))
    (1 to 4).foreach(k => m.getOrElseUpdate(k)(s"v$k"))
    assert(dropped.toList == List((1, "v1"), (2, "v2")))
    assert(m.size == 2)
    m.clear()
    assert(dropped.toList ==
      List((1, "v1"), (2, "v2"), (3, "v3"), (4, "v4")))
    assert(m.size == 0)
  }

  test("invalidate drops one key with onEvict; miss returns false") {
    val dropped = scala.collection.mutable.ArrayBuffer.empty[Int]
    val m = new BoundedMemo[Int, String](4, (k, _) => dropped += k)
    m.getOrElseUpdate(7)("v7")
    assert(m.invalidate(7))
    assert(!m.invalidate(7))
    assert(dropped.toList == List(7))
    var rebuilt = false
    m.getOrElseUpdate(7) { rebuilt = true; "v7'" }
    assert(rebuilt)
  }

  test("build runs once per key under concurrent access") {
    val m = new BoundedMemo[Int, String](8)
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 8).map { _ =>
      new Thread(() =>
        (1 to 100).foreach { i =>
          m.getOrElseUpdate(i % 4) { builds.incrementAndGet(); "v" }
        })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(builds.get == 4)
  }

  test("bound must be positive") {
    intercept[IllegalArgumentException](new BoundedMemo[Int, Int](0))
  }
}
