package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Profiling

/** Accuracy and set-algebra structure of the KMV/theta distinct sketch
  * (`approx_distinct_kmv`). The driver gate hash-checks the exact
  * sketch state (k-min sets are exact BIGINTs); these specs pin the
  * derived estimates: NDV accuracy in the full-sketch regime and the
  * Jaccard-based intersection, the capability HLL's inclusion-exclusion
  * can't deliver for small overlaps.
  */
class KmvSketchSpec extends SparkTestBase {

  test("KMV estimate within 20% across cardinality regimes (SE ≈ 6.3% at k=256)") {
    Seq(100L, 20000L, 200000L).foreach { n =>
      val toks = spark.range(n)
        .select(Profiling.h52Of(concat(lit("v"), col("id"))).as("h"))
        .distinct()
      val w = Window.partitionBy(lit(1)).orderBy("h")
      val row = toks.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= Profiling.KmvK)
        .agg(count(lit(1)).as("n_vals"), max(col("h")).as("kth"))
        .collect().head
      val est = Profiling.kmvEstimate(row.getLong(0), row.getLong(1))
      val relErr = math.abs(est - n) / n.toDouble
      assert(relErr < 0.20, s"n=$n: estimate $est (err $relErr)")
    }
  }

  test("gate rows: Jaccard-numerator intersection tracks the exact overlap") {
    val rows = Profiling.approxDistinctKmv(spark, sf0001)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("a", "b", "union"))
    val u = rows("union")
    val k = u.getLong(1) // union sketch size (≤ KmvK)
    val jacc = u.getLong(4).toDouble / k
    val unionEst = Profiling.kmvEstimate(u.getLong(1), u.getLong(2))
    val interEst = jacc * unionEst
    val interExact = (rows("a").getLong(3) + rows("b").getLong(3)
      - u.getLong(3)).toDouble
    assert(interExact > 0, "fixture lost its overlapping customers")
    val relErr = math.abs(interEst - interExact) / interExact
    assert(relErr < 0.25, s"intersection est $interEst vs exact $interExact")
  }

  test("union k-mins derive from the two k-sets alone (merge == rescan)") {
    // rescan path: both years as ONE set through the same construction
    val base = Tables.orders(spark, sf0001)
      .filter(year(col("o_orderdate")).isin(1996, 1997))
      .select(Profiling.h52Of(col("o_custkey").cast("string")).as("h"))
      .distinct()
    val w = Window.partitionBy(lit(1)).orderBy("h")
    val rescan = base.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= Profiling.KmvK)
      .agg(count(lit(1)).as("n_vals"), max(col("h")).as("kth"))
      .collect().head
    val u = Profiling.approxDistinctKmv(spark, sf0001)
      .collect().find(_.getString(0) == "union").get
    assert(u.getLong(1) == rescan.getLong(0) && u.getLong(2) == rescan.getLong(1),
      s"merged (${u.getLong(1)}, ${u.getLong(2)}) vs rescan $rescan")
  }
}
