package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Semantic pins for the feature-engineering gates beyond the DuckDB
  * hash gate: q77's leave-one-out property (a row's encoding is the
  * exact mean of the OTHER rows of its category — no self-leakage) and
  * feature_hash's mass conservation (every event contributes exactly
  * |features| rows; Σ n = 3·|events|, Σ sum_cents = 3·Σ cents).
  */
class FeatureEncodeSpec extends SparkTestBase {

  test("q77 leave-one-out: encoding equals the mean of the other rows, no self-leak") {
    val enc = Relational.q77TargetEncode(spark, sf0001)
      .select("event_id", "event_type", "cents", "loo_cents", "prior_cents")
      .collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))))
    val byType = enc.groupBy(_._2._1).view
      .mapValues(rs => (rs.map(_._2._2).sum, rs.length.toLong)).toMap
    enc.foreach { case (id, (t, cents, loo, prior)) =>
      val (tSum, tN) = byType(t)
      val expected = if (tN > 1) (tSum - cents) / (tN - 1) else prior
      assert(loo == expected, s"event $id: loo $loo != $expected")
    }
    // the plain mean WOULD leak: assert the two differ somewhere
    val leaky = enc.filter { case (_, (t, cents, loo, _)) =>
      val (tSum, tN) = byType(t); loo != tSum / tN
    }
    assert(leaky.nonEmpty, "LOO indistinguishable from the leaking mean on this corpus")
  }

  test("feature_hash conserves feature mass onto the fixed bucket space") {
    val ev = Tables.events(spark, sf0001)
      .select(expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val nEvents = ev.count()
    val totalCents = ev.agg(sum("cents")).collect()(0).getLong(0)
    val fh = Relational.featureHash(spark, sf0001).collect()
    assert(fh.map(_.getLong(1)).sum == 3L * nEvents)
    assert(fh.map(_.getLong(2)).sum == 3L * totalCents)
    val buckets = fh.map(_.getLong(0))
    assert(buckets.forall(b => b >= 0 && b < Relational.FeatureHashBuckets))
    assert(buckets.distinct.length == buckets.length)
  }
}
