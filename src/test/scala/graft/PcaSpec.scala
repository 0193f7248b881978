package graft

import org.apache.spark.sql.functions._

import graft.functions.Similarity

/** Pins the fixed-point power-iteration PCA beyond the cross-engine
  * hash gate (which proves determinism, not quality):
  *
  *  - a PLANTED dominant direction must be recovered (sign-agnostic
  *    cosine ≥ 0.99) — the iteration converges to the top eigenvector,
  *    not just to "some deterministic vector";
  *  - the distributed gate must equal a driver-side BigInt replay of
  *    the same algorithm exactly (the all-reduce aggregate and literal
  *    re-broadcast introduce no divergence);
  *  - the projection gate's margins must cover the corpus.
  */
class PcaSpec extends SparkTestBase {

  /** Driver-side BigInt replay of pcaPowerTrain over a collected
    * quantized corpus — same quantization, shift, and normalization. */
  private def driverPower(rows: Array[Array[Long]]): (Array[BigInt], BigInt) = {
    val dim = Similarity.PcaDim
    var x = Array.fill(dim)(BigInt(Similarity.PcaXScale))
    var gain = BigInt(1)
    for (_ <- 1 to Similarity.PcaIters) {
      val y = Array.fill(dim)(BigInt(0))
      rows.foreach { e =>
        var dot = BigInt(0)
        var j = 0
        while (j < dim) { dot += BigInt(e(j)) * x(j); j += 1 }
        // sign-safe truncating shift, as in the gate and the oracle
        val sdot = BigInt(dot.signum) * (dot.abs / Similarity.PcaDotShift)
        j = 0
        while (j < dim) { y(j) += BigInt(e(j)) * sdot; j += 1 }
      }
      gain = y.map(_.abs).max.max(BigInt(1))
      x = y.map(v => BigInt(v.signum) * (v.abs * Similarity.PcaXScale / gain))
    }
    (x, gain)
  }

  private def quantized(dir: String): Array[Array[Long]] =
    Tables.embeddings(spark, dir)
      .select(expr(
        s"transform(embedding, v -> CAST(round(CAST(v AS DOUBLE) * ${Similarity.PcaEScale}) AS BIGINT))"))
      .collect().map(_.getSeq[Long](0).toArray)

  test("embed_pca_power == driver-side BigInt replay (exact)") {
    val got = Similarity.embedPcaPower(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val (x, gain) = driverPower(quantized(sf0001))
    assert(got.length == Similarity.PcaDim)
    got.foreach { case (dim, loading, g) =>
      assert(loading == x(dim.toInt - 1).toLong, s"loading at dim $dim")
      assert(g == gain.toLong, "gain")
    }
  }

  test("power iteration recovers a planted dominant direction") {
    val s = spark
    import s.implicits._
    val dim = Similarity.PcaDim
    val rnd = new scala.util.Random(7)
    // unit-ish planted direction with mixed signs
    val u = Array.tabulate(dim)(j => math.sin(j * 1.7 + 0.3) / math.sqrt(dim.toDouble))
    val rows = (0 until 400).map { i =>
      val a = (if (i % 2 == 0) 1 else -1) * (0.3 + rnd.nextDouble() * 0.2)
      val noise = Array.fill(dim)((rnd.nextDouble() - 0.5) * 0.02)
      val v = Array.tabulate(dim)(j => (a * u(j) + noise(j)).toFloat)
      (i.toLong, v.toSeq, i % 10)
    }
    val tmp = java.nio.file.Files.createTempDirectory("pca_spec").toString
    rows.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .withColumn("label", col("label").cast("int"))
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val got = Similarity.embedPcaPower(spark, tmp).collect()
      .sortBy(_.getLong(0)).map(_.getLong(1).toDouble)
    val nx = math.sqrt(got.map(v => v * v).sum)
    val nu = math.sqrt(u.map(v => v * v).sum)
    val cos = math.abs(got.zip(u).map { case (a, b) => a * b }.sum / (nx * nu))
    assert(cos >= 0.99, s"planted-direction cosine $cos < 0.99")
  }

  test("embed_kmeans partitions the corpus and recovers planted blobs") {
    val s = spark
    import s.implicits._
    val dim = Similarity.PcaDim
    val k = Similarity.KmeansK
    val rnd = new scala.util.Random(11)
    // k well-separated blob centers; vec_id 0..k-1 are one anchor per
    // blob (the init contract), the rest cycle through blobs
    val centers = Array.tabulate(k, dim)((c, j) =>
      math.sin(c * 2.1 + j * 0.37) * 0.4)
    val rows = (0 until 560).map { i =>
      val blob = i % k
      val v = Array.tabulate(dim)(j =>
        (centers(blob)(j) + (rnd.nextDouble() - 0.5) * 0.02).toFloat)
      (i.toLong, v.toSeq, blob)
    }
    val tmp = java.nio.file.Files.createTempDirectory("kmeans_spec").toString
    rows.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .withColumn("label", col("label").cast("int"))
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val got = Similarity.embedKmeans(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == k * dim)
    // partition: sizes sum to the corpus, every blob lands whole in its
    // anchor's cluster (70 vectors per blob, anchors are vec_id 0..7 =
    // blobs 0..7 in order)
    val sizes = got.groupBy(_._1).map { case (c, rs) => c -> rs.head._4 }
    assert(sizes.values.sum == 560L)
    assert(sizes.values.forall(_ == 70L), s"blob split across clusters: $sizes")
    // centroids sit on the planted centers (within quantization + noise)
    got.foreach { case (c, dimIdx, cv, _) =>
      val want = centers(c.toInt)(dimIdx.toInt - 1) * Similarity.PcaEScale
      assert(math.abs(cv - want) <= 15.0,
        s"cluster $c dim $dimIdx centroid $cv vs planted $want")
    }
    // the purity card is perfectly diagonal on planted blobs: labels
    // equal blob ids, so exactly k (cluster, label) cells of 70 each
    val prof = Similarity.embedKmeansProfile(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(prof.length == k && prof.forall(_._3 == 70L),
      s"planted purity card not diagonal: ${prof.mkString(", ")}")
    assert(prof.map(_._1).distinct.length == k)
  }

  test("embed_pca_project margins cover the corpus and means sit inside them") {
    val got = Similarity.embedPcaProject(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val total = Tables.embeddings(spark, sf0001).count()
    assert(got.map(_._2).sum == total)
    got.foreach { case (label, n, mean, lo, hi) =>
      assert(n > 0 && lo <= mean && mean <= hi, s"label $label band ($lo, $mean, $hi)")
    }
  }
}
