package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.QualityModel

/** Pins the distilled quality filter beyond the cross-engine hash gate
  * (which proves determinism, not learning): the distributed trainer
  * must equal a sequential Long replay exactly, and the trained model
  * must genuinely FIT the rule — high accuracy and strictly better
  * than either constant predictor. */
class QualityModelSpec extends SparkTestBase {

  private def collected: (Array[Long], Array[Array[Long]]) = {
    val rows = QualityModel.labeled(spark, sf0001).collect()
    (rows.map(_.getLong(1)),
      rows.map(r => (2 until 2 + QualityModel.Dim).map(r.getLong).toArray))
  }

  /** Sequential replay of the batch-perceptron loop. */
  private def driverTrain(ys: Array[Long], xs: Array[Array[Long]]): Array[Long] = {
    val d = QualityModel.Dim
    var w = Array.fill(d)(0L)
    for (_ <- 1 to QualityModel.Rounds) {
      val g = Array.fill(d)(0L)
      var cnt = 0L
      ys.indices.foreach { i =>
        var m = 0L
        var j = 0
        while (j < d) { m += w(j) * xs(i)(j); j += 1 }
        if (ys(i) * m <= 0L) {
          cnt += 1
          j = 0
          while (j < d) { g(j) += ys(i) * xs(i)(j); j += 1 }
        }
      }
      val c = math.max(cnt, 1L)
      w = w.zipWithIndex.map { case (wj, j) =>
        wj + (if (g(j) < 0) -((-g(j)) / c) else g(j) / c)
      }
    }
    w
  }

  test("distributed trainer == sequential Long replay (exact)") {
    val (ys, xs) = collected
    val want = driverTrain(ys, xs)
    val got = QualityModel.train(spark, sf0001)._2.weights
    assert(got.toSeq == want.toSeq)
  }

  test("the trained model FITS: >= 0.9 accuracy, beats both constant predictors") {
    val rows = QualityModel.qualityPerceptron(spark, sf0001).collect()
    val r = rows.head
    val (tp, fp, tn, fn) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    val n = tp + fp + tn + fn
    val pos = tp + fn
    val neg = fp + tn
    assert(n > 0 && pos > 0 && neg > 0, "label must split the corpus")
    val correct = tp + tn
    assert(correct.toDouble / n >= 0.9,
      s"accuracy ${correct.toDouble / n} < 0.9 (conf $tp/$fp/$tn/$fn)")
    assert(correct > math.max(pos, neg),
      s"model no better than a constant predictor ($correct vs $pos/$neg)")
    // confusion identical on every weight row; weights rows complete
    assert(rows.length == QualityModel.Dim)
    assert(rows.forall(x => (x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5))
      == ((tp, fp, tn, fn))))
  }
}
