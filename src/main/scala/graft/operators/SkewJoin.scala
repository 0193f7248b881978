package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY §7.3 / SCALE.md item 5).
  *
  * AQE's skew-join split handles most skew automatically; this helper is
  * the explicit form for the cases AQE can't see (e.g. skew introduced by
  * an upstream transformation, or a build side too large to broadcast but
  * with a handful of pathological keys): the probe side gets a uniform
  * random salt in [0, buckets), the build side is replicated once per
  * salt value, and the join key becomes (key, salt) — splitting each hot
  * key's row group across `buckets` reducers.
  *
  * Row multiplicity is unchanged (each probe row matches exactly the one
  * replica carrying its salt), so any downstream aggregate is unaffected.
  */
object SkewJoin {

  /** Inner equi-join of `probe` and `build` on `key`, salted into
    * `buckets` sub-keys. `build` is replicated `buckets`×: use only when
    * build ≪ probe but too big (or too skewed) to broadcast. */
  def saltedInner(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val salted = probe.withColumn("__salt", (rand(seed = 42) * buckets).cast("int"))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
