package graft

import org.apache.spark.sql.functions._

import graft.functions.Similarity

/** Differential + pruning evidence for the IVF-accelerated k-center
  * ([[Similarity.kcenterGreedyCellPruned]], gate `sample_kcenter_ivf`).
  *
  * Two corpora, two claims:
  *  - EXACTNESS on the gate corpus (isotropic test embeddings, where the
  *    angular bound rarely fires): the pruned loop returns the exact
  *    greedy selection row-for-row, double-for-double.
  *  - SUB-LINEAR PROBING on a clustered corpus (the geometry real
  *    embedding spaces have): once a cluster is covered by a selection,
  *    its cells stop being probed — per-pass candidate counts DROP below
  *    n, and the pruned selection still equals a driver-side exact greedy
  *    replay of the identical rounded-cosine semantics.
  */
class KcenterIvfSpec extends SparkTestBase {

  test("gate corpus: IVF-pruned selection == exact greedy, all columns") {
    val exact = Similarity.sampleKcenter(spark, sf0001).collect()
    val pruned = Similarity.sampleKcenterIvf(spark, sf0001).collect()
    assert(pruned.length == exact.length)
    exact.zip(pruned).foreach { case (e, p) =>
      assert(e.getLong(0) == p.getLong(0), "rank")
      assert(e.getLong(1) == p.getLong(1), s"vec_id at rank ${e.getLong(0)}")
      assert(e.getDouble(2) == p.getDouble(2), s"sel_dist at rank ${e.getLong(0)}")
    }
  }

  /** 8 tight clusters (≤ ~4° angular radius) around well-separated
    * pseudo-random unit centers in 64 dims — deterministic seed, so the
    * probe-count assertions are stable run to run. */
  private def clusteredCorpus(nClusters: Int, perCluster: Int, dim: Int)
      : Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(42)
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val centers = Array.fill(nClusters)(unit(Array.fill(dim)(rnd.nextGaussian())))
    (0 until nClusters).flatMap { c =>
      (0 until perCluster).map { j =>
        // center + small gaussian noise, renormalized → a few degrees off
        val noisy = unit(centers(c).map(_ + 0.04 * rnd.nextGaussian()))
        ((c * perCluster + j).toLong, noisy.map(_.toFloat))
      }
    }
  }

  /** Driver-side exact greedy with the SAME rounded-cosine semantics as
    * the gate (fold order of CosineSimilarity, round-6 HALF_UP): the
    * ground truth the pruned distributed loop must reproduce. */
  private def exactGreedy(vs: Seq[(Long, Array[Float])], k: Int)
      : Seq[(Long, Long, Double)] = {
    def dist(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      val c = dot / (math.sqrt(na) * math.sqrt(nb))
      1.0 - BigDecimal(c)
        .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val sorted = vs.sortBy(_._1)
    var sel = Vector((1L, sorted.head._1, 2.0))
    var selSet = Set(sorted.head._1)
    val d = scala.collection.mutable.Map.empty[Long, Double]
    var z = sorted.head._2
    while (sel.size < k) {
      sorted.foreach { case (id, v) =>
        val nd = dist(v, z)
        d(id) = math.min(d.getOrElse(id, 2.0), nd)
      }
      val (id, dd) = sorted.iterator.filterNot(t => selSet(t._1))
        .map(t => (t._1, d(t._1)))
        .maxBy { case (i, x) => (x, -i) }(
          Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long))
      sel = sel :+ ((sel.size + 1L, id, dd))
      selSet += id
      z = sorted.find(_._1 == id).get._2
    }
    sel
  }

  test("clustered corpus: pruned == exact greedy AND per-pass probes go sub-linear") {
    val vs = clusteredCorpus(nClusters = 8, perCluster = 60, dim = 64)
    val n = vs.size.toLong
    import spark.implicits._
    val emb = vs.toDF("vec_id", "embedding")
    val k = 8
    val (selDf, probed) = Similarity.kcenterGreedyCellPruned(spark, emb, k)
    val sel = selDf.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expect = exactGreedy(vs, k)
    assert(sel.toSeq == expect,
      s"pruned selection diverged from exact greedy:\n$sel\nvs\n$expect")

    assert(probed.size == k - 1)
    // pass 1 initializes every d off the sentinel — full probe by design
    assert(probed.head == n, s"init pass must probe all: $probed")
    // covered clusters stop probing: probe counts are STRICTLY decreasing
    // pass over pass (measured 480→419→360→299→240→131→104 — the
    // (uncovered clusters)/n fraction coverage theory predicts), the
    // final pass scans under a third of the corpus, and the post-init
    // total stays well under the unpruned (k-2)·n
    assert(probed.last < n / 3, s"no pruning on clustered data: $probed")
    assert(probed.sliding(2).forall(p => p.last < p.head),
      s"probe counts not strictly decreasing: $probed")
    assert(probed.tail.sum < (k - 2) * n * 3 / 5,
      s"post-init probe volume not sub-linear: $probed")
  }
}
