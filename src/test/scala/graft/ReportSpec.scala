package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Driver-side brute-force models for the round-15 report/analytics
  * gates: the survival table and the cross-source overlap matrix are
  * recomputed in plain Scala from the raw tables and compared
  * row-for-row — independent of both engines' SQL.
  */
class ReportSpec extends SparkTestBase {

  test("q82 survival table == driver model from raw events") {
    val s = spark
    import s.implicits._
    val days = graft.Tables.events(spark, sf0001)
      .select(col("user_id"),
        expr("datediff(to_date(ts), DATE '1970-01-01')").cast("long").as("day"))
      .as[(Long, Long)].collect()
    val life = days.groupBy(_._1).map { case (_, xs) =>
      xs.map(_._2).max - xs.map(_._2).min
    }.toSeq
    val total = life.size.toLong
    val hist = life.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val model = hist.keys.toSeq.sorted.map { k =>
      val nRisk = hist.filter(_._1 >= k).values.sum
      val nEnd = hist(k)
      (k, nRisk, nEnd, (nRisk - nEnd) * 1000000L / total)
    }
    val got = Relational.q82Survival(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == model, s"survival divergence: $got vs $model")
    // survival is monotone non-increasing and starts below 1e6
    assert(got.map(_._4) == got.map(_._4).sorted.reverse)
    assert(got.last._4 == 0L, "the longest lifetime must end the curve at 0")
  }

  test("q83 KS statistic == driver model from raw events") {
    val s = spark
    import s.implicits._
    val ev = graft.Tables.events(spark, sf0001)
      .select(col("event_type"),
        expr("datediff(to_date(ts), DATE '1970-01-01')").cast("long").as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .as[(String, Long, Long)].collect()
    val mid = Math.floorDiv(ev.map(_._2).min + ev.map(_._2).max, 2L)
    val model = ev.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, xs) =>
      val ref = xs.filter(_._2 <= mid).map(_._3)
      val live = xs.filter(_._2 > mid).map(_._3)
      val support = (ref ++ live).distinct.sorted
      val (nr, nl) = (math.max(ref.length.toLong, 1L), math.max(live.length.toLong, 1L))
      val d = support.map { v =>
        math.abs(ref.count(_ <= v) * 1000000L / nr - live.count(_ <= v) * 1000000L / nl)
      }.max
      (t, ref.length.toLong, live.length.toLong, d)
    }
    val got = Relational.q83KsTest(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == model, s"KS divergence: $got vs $model")
    // sanity: a KS gap is a ppm in [0, 1e6]
    assert(got.forall(r => r._4 >= 0L && r._4 <= 1000000L))
  }

  test("q84 Mann-Whitney U / AUC == brute-force pair count from raw events") {
    val s = spark
    import s.implicits._
    val ev = graft.Tables.events(spark, sf0001)
      .select(col("event_type"),
        expr("datediff(to_date(ts), DATE '1970-01-01')").cast("long").as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .as[(String, Long, Long)].collect()
    val mid = Math.floorDiv(ev.map(_._2).min + ev.map(_._2).max, 2L)
    // the doubled U IS the doubled pair count: 2*#(live>ref) + #(ties)
    // -- counted directly over all (ref, live) pairs, a model sharing
    // NO algebra with the midrank form the query computes
    val model = ev.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, xs) =>
      val ref = xs.filter(_._2 <= mid).map(_._3)
      val live = xs.filter(_._2 > mid).map(_._3)
      var wins2 = 0L
      live.foreach { l => ref.foreach { r =>
        if (l > r) wins2 += 2L else if (l == r) wins2 += 1L
      } }
      val d = 2L * ref.length * live.length
      val auc = if (d == 0L) null
        else java.lang.Long.valueOf((wins2 / d) * 1000000L + (wins2 % d) * 1000000L / d)
      (t, ref.length.toLong, live.length.toLong, wins2, auc)
    }
    val got = Relational.q84MannWhitney(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) null else java.lang.Long.valueOf(r.getLong(4)))).toSeq
    assert(got == model, s"U divergence: $got vs $model")
    // sanity: AUC ppm in [0, 1e6]; both halves populated at this SF
    assert(got.forall(r => r._5 != null && r._5 >= 0L && r._5 <= 1000000L))
  }

  test("report_drift_panel == the three drift gates joined (composition, not re-derivation)") {
    import org.apache.spark.sql.functions.col
    val panel = Relational.reportDriftPanel(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    val chi = Relational.q79DriftChisq(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val ks = Relational.q83KsTest(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val auc = Relational.q84MannWhitney(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(panel.map(_._1).toSet == chi.keySet && panel.nonEmpty)
    panel.foreach { case (t, nRef, nLive, ksPpm, uX2, aucPpm, chisq) =>
      val (cRef, cLive, cChisq) = chi(t)
      assert((nRef, nLive) == (cRef, cLive), s"$t margins")
      assert(chisq == cChisq, s"$t chisq")
      assert(ksPpm == ks(t), s"$t ks")
      assert((uX2, aucPpm) == auc(t), s"$t auc")
    }
  }

  test("report_source_overlap == driver brute force (tokenize, shingle, intersect)") {
    val s = spark
    import s.implicits._
    val docs = graft.Tables.documents(spark, sf0001)
      .select(col("source"), col("text")).as[(String, String)].collect()
    // the WordShingles contract: word 3-grams of lowercased whitespace
    // tokens; < 3 tokens degrade to the whole text as one shingle
    def shingles(text: String): Seq[String] = {
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSeq
      else Seq(toks.mkString(" "))
    }
    val bySource = docs.groupBy(_._1).view
      .mapValues(_.flatMap(d => shingles(d._2)).toSet).toMap
    val sources = bySource.keys.toSeq.sorted
    val model = (for {
      a <- sources; b <- sources if a < b
      shared = (bySource(a) intersect bySource(b)).size.toLong if shared > 0
    } yield {
      val (na, nb) = (bySource(a).size.toLong, bySource(b).size.toLong)
      (a, b, na, nb, shared, shared * 1000000L / math.min(na, nb))
    }).toSeq
    val got = graft.functions.Dedup.sourceOverlap(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == model,
      s"overlap divergence, e.g. ${got.diff(model).take(2)} vs ${model.diff(got).take(2)}")
    assert(got.nonEmpty)
  }
}
