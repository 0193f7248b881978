package graft

import org.apache.spark.sql.functions._

import graft.functions.Dedup

/** Pins the Bloom decontamination's one-sided error — the gate runs at
  * m = 2^20 where false positives are (almost always) absent, so the
  * approximate regime needs forcing: a tiny filter guarantees
  * collisions, and the bloom count must bound the exact count from
  * above, never below.
  */
class BloomDecontaminationSpec extends SparkTestBase {

  test("gate geometry: bloom count bounds exact count, actions agree with counts") {
    val rows = Dedup.decontaminateBloom(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nb, ne) = (r.getAs[Long]("n_bloom"), r.getAs[Long]("n_exact"))
      assert(nb >= ne, s"doc ${r.get(0)}: bloom $nb undercounts exact $ne")
      assert(r.getAs[String]("action") ===
        (if (nb >= 4) "quarantine" else "keep"))
    }
    // the benchmark items themselves are fully contaminated — the
    // filter must never miss them (no false negatives, by construction)
    val quarantined = rows.filter(_.getAs[String]("action") == "quarantine")
      .map(_.getAs[Long]("doc_id")).toSet
    val bench = rows.map(_.getAs[Long]("doc_id")).filter(_ % 13 == 0)
      .filter(id => quarantinedExactly(rows, id))
    assert(bench.forall(quarantined.contains),
      "a doc the exact rule quarantines must also be bloom-quarantined")
  }

  private def quarantinedExactly(rows: Array[org.apache.spark.sql.Row], id: Long): Boolean =
    rows.find(_.getAs[Long]("doc_id") == id).exists(_.getAs[Long]("n_exact") >= 4)

  test("bitmap form reproduces the position-set form bit-for-bit") {
    // the production 128 KB bitmap + scalar bit test must make IDENTICAL
    // quarantine decisions — including identical false positives — to
    // the broadcast position-set join it replaces
    val set = Dedup.decontaminateBloom(spark, sf0001).collect().map(_.toSeq)
    val bm = Dedup.decontaminateBloomBitmap(spark, sf0001).collect().map(_.toSeq)
    assert(set.nonEmpty)
    assert(bm.toSeq === set.toSeq)
  }

  test("bitmap form matches the set form in the forced-FP regime too") {
    // m=16 saturates: the regime where every bit-layout or probe-order
    // divergence would surface as a count difference
    val set = Dedup.decontaminateBloom(spark, sf0001, m = 16, k = 3)
      .collect().map(_.toSeq)
    val bm = Dedup.decontaminateBloomBitmap(spark, sf0001, m = 16, k = 3)
      .collect().map(_.toSeq)
    assert(bm.toSeq === set.toSeq)
  }

  test("a starved filter forces false positives but never false negatives") {
    // m=16, k=3: thousands of benchmark positions saturate the filter,
    // so nearly every corpus shingle bloom-hits — the FP regime.
    val rows = Dedup.decontaminateBloom(spark, sf0001, m = 16, k = 3).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_bloom") >= r.getAs[Long]("n_exact"))
    }
    val fp = rows.count(r => r.getAs[Long]("n_bloom") > r.getAs[Long]("n_exact"))
    assert(fp > 0, "16 positions cannot hold the benchmark set without collisions")
  }
}
