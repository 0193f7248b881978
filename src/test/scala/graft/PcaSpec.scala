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

  /** Sequential BigInt replay of the top-m deflation chain at an
    * arbitrary dim — the model the distributed cores must match. */
  private def driverTopm(rows0: Array[Array[Long]], dim: Int, iters: Int,
      m: Int): Seq[(Array[BigInt], BigInt)] = {
    var rows = rows0.map(_.map(BigInt(_)))
    val out = Seq.newBuilder[(Array[BigInt], BigInt)]
    for (c <- 1 to m) {
      var x = Array.fill(dim)(BigInt(Similarity.PcaXScale))
      var gain = BigInt(1)
      for (_ <- 1 to iters) {
        val y = Array.fill(dim)(BigInt(0))
        rows.foreach { e =>
          var dot = BigInt(0)
          var j = 0
          while (j < dim) { dot += e(j) * x(j); j += 1 }
          val sdot = BigInt(dot.signum) * (dot.abs / Similarity.PcaDotShift)
          j = 0
          while (j < dim) { y(j) += e(j) * sdot; j += 1 }
        }
        gain = y.map(_.abs).max.max(BigInt(1))
        x = y.map(v => BigInt(v.signum) * (v.abs * Similarity.PcaXScale / gain))
      }
      out += ((x, gain))
      if (c < m) {
        val nn = x.map(v => v * v).sum
        rows = rows.map { e =>
          Array.tabulate(dim) { j =>
            val p = (0 until dim).map(i => e(i) * x(i)).sum
            val num = p * x(j)
            e(j) - BigInt(num.signum) * (num.abs / nn)
          }
        }
      }
    }
    out.result()
  }

  test("top-m deflation chain at a SECOND dim (16) == sequential BigInt replay") {
    val s = spark
    import s.implicits._
    val dim = 16
    val rnd = new scala.util.Random(23)
    val raw = (0 until 200).map { i =>
      (i.toLong, i % 4, Seq.tabulate(dim)(j =>
        math.round(math.sin(i * 0.61 + j * 1.13) * 700 + (rnd.nextInt(41) - 20))))
    }
    var e = raw.toDF("vec_id", "label", "e")
    val got = (1 to 3).map { c =>
      val (x, gain) = Similarity.pcaPowerIterateFrame(e, dim, Similarity.PcaIters)
      if (c < 3) e = Similarity.deflateFrame(e, x, dim).localCheckpoint()
      (x, gain)
    }
    val want = driverTopm(raw.map(_._3.toArray).toArray, dim, Similarity.PcaIters, 3)
    got.zip(want).zipWithIndex.foreach { case (((gx, gg), (wx, wg)), c) =>
      assert(gx.toSeq == wx.toSeq, s"component ${c + 1} loadings")
      assert(gg == wg, s"component ${c + 1} gain")
    }
  }

  test("embed_pca_topm component 1 == embed_pca_power, and components differ") {
    val power = Similarity.embedPcaPower(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val topm = Similarity.embedPcaTopm(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(topm.length == Similarity.PcaTopM * Similarity.PcaDim)
    val c1 = topm.filter(_._1 == 1L).sortBy(_._2).map(t => (t._2, t._3, t._4))
    assert(c1.toSeq == power.toSeq, "component 1 != embed_pca_power")
    val byComp = topm.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(byComp(1L) != byComp(2L), "deflation returned the same axis")
  }

  test("deflation recovers a PLANTED second direction") {
    val s = spark
    import s.implicits._
    val dim = Similarity.PcaDim
    val rnd = new scala.util.Random(31)
    // two orthogonal planted directions, the first with 3x the energy
    val u1 = Array.tabulate(dim)(j => math.sin(j * 1.7 + 0.3) / math.sqrt(dim.toDouble))
    val u2raw = Array.tabulate(dim)(j => math.cos(j * 0.9 + 1.1))
    val d12 = u1.zip(u2raw).map { case (a, b) => a * b }.sum
    val n1 = u1.map(v => v * v).sum
    val u2u = u2raw.zip(u1).map { case (b, a) => b - d12 / n1 * a }
    val n2 = math.sqrt(u2u.map(v => v * v).sum)
    val u2 = u2u.map(_ / n2)
    val rows = (0 until 400).map { i =>
      val a = (if (i % 2 == 0) 1 else -1) * (0.6 + rnd.nextDouble() * 0.2)
      val b = (if (i % 3 == 0) 1 else -1) * (0.2 + rnd.nextDouble() * 0.05)
      val noise = Array.fill(dim)((rnd.nextDouble() - 0.5) * 0.01)
      (i.toLong,
        Array.tabulate(dim)(j => (a * u1(j) + b * u2(j) + noise(j)).toFloat).toSeq,
        i % 10)
    }
    val tmp = java.nio.file.Files.createTempDirectory("pca_topm_spec").toString
    rows.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .withColumn("label", col("label").cast("int"))
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val topm = Similarity.embedPcaTopm(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def cosTo(c: Long, u: Array[Double]): Double = {
      val x = topm.filter(_._1 == c).sortBy(_._2).map(_._3.toDouble)
      val nx = math.sqrt(x.map(v => v * v).sum)
      val nu = math.sqrt(u.map(v => v * v).sum)
      math.abs(x.zip(u).map { case (p, q) => p * q }.sum / (nx * nu))
    }
    assert(cosTo(1L, u1) >= 0.99, s"PC1 cosine ${cosTo(1L, u1)}")
    assert(cosTo(2L, u2) >= 0.95, s"PC2 cosine ${cosTo(2L, u2)}")
  }

  /** Sequential replay of the packed-min Lloyd loop at arbitrary
    * (dim, k) — the model [[Similarity.kmeansTrainFrame]] must match. */
  private def driverKmeans(rows: Array[(Long, Array[Long])], dim: Int,
      k: Int, iters: Int): (Array[Array[Long]], Array[Long]) = {
    var cents = rows.filter(_._1 < k).sortBy(_._1).map(_._2.clone())
    var sizes = Array.fill(k)(0L)
    for (_ <- 1 to iters) {
      val sums = Array.ofDim[Long](k, dim)
      val ns = Array.fill(k)(0L)
      rows.foreach { case (_, e) =>
        var best = Long.MaxValue
        var bc = 0
        var c = 0
        while (c < k) {
          var d = 0L
          var j = 0
          while (j < dim) { val f = e(j) - cents(c)(j); d += f * f; j += 1 }
          val packed = d * 16L + c
          if (packed < best) { best = packed; bc = c }
          c += 1
        }
        ns(bc) += 1
        var j = 0
        while (j < dim) { sums(bc)(j) += e(j); j += 1 }
      }
      sizes = ns.clone()
      val next = cents.map(_.clone())
      for (c <- 0 until k if ns(c) > 0; j <- 0 until dim) {
        val s = sums(c)(j)
        next(c)(j) = if (s < 0) -((-s) / ns(c)) else s / ns(c)
      }
      cents = next
    }
    (cents, sizes)
  }

  test("kmeansTrainFrame at a SECOND (dim, k) == sequential replay") {
    val s = spark
    import s.implicits._
    val dim = 16
    val k = 5
    val raw = (0 until 230).map { i =>
      (i.toLong, Seq.tabulate(dim)(j =>
        math.round(math.cos(i * 0.47 + j * 0.83) * 600) + (i % 7) - 3))
    }
    val e = raw.toDF("vec_id", "e")
    val (gc, gs) = Similarity.kmeansTrainFrame(e, dim, k, Similarity.KmeansIters)
    val (wc, ws) = driverKmeans(
      raw.map { case (id, v) => (id, v.toArray) }.toArray, dim, k,
      Similarity.KmeansIters)
    assert(gc.map(_.toSeq).toSeq == wc.map(_.toSeq).toSeq, "centroids")
    assert(gs.toSeq == ws.toSeq, "sizes")
    intercept[IllegalArgumentException](Similarity.kmeansTrainFrame(e, dim, 17, 1))
  }
}
