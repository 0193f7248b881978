package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewJoin

class SkewJoinSpec extends SparkTestBase {

  test("salted join preserves join multiplicity and spreads hot keys across salts") {
    val s = spark
    import s.implicits._
    // heavily skewed probe: 10k rows for key 1, a handful elsewhere
    val probe = (Seq.fill(10000)(1) ++ Seq(2, 2, 3)).toDF("k").withColumn("pv", monotonically_increasing_id())
    val build = Seq((1, "a"), (2, "b"), (3, "c"), (4, "d")).toDF("k", "bv")

    val plain = probe.join(build, "k")
    val salted = SkewJoin.saltedInner(probe, build, "k", buckets = 8)

    assert(salted.count() == plain.count(), "salting changed join multiplicity")
    assert(salted.groupBy("k").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      == plain.groupBy("k").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap)

    // the hot key actually uses multiple salt buckets pre-join
    val saltSpread = probe.filter($"k" === 1)
      .withColumn("__salt", (rand(seed = 42) * 8).cast("int"))
      .select("__salt").distinct().count()
    assert(saltSpread >= 6, s"hot key only hit $saltSpread of 8 salt buckets")
  }
}
