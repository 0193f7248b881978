package graft

import org.apache.spark.sql.functions._

/** Approximate-aggregate surface for interactive exploration at 100 TB:
  * HLL++ distinct counts and quantile sketches. These are deliberately
  * NOT in the driver gate — their sketch values are implementation-
  * specific and no cross-engine oracle exists — so the capability is
  * pinned here against the exact answers with error bounds instead.
  */
class ApproxSketchSpec extends SparkTestBase {

  test("approx_count_distinct (HLL++, rsd 2%) lands within 5% of exact") {
    val ev = Tables.events(spark, sf0001)
    val exact = ev.select(countDistinct(col("user_id"))).head.getLong(0)
    val approx = ev.select(approx_count_distinct(col("user_id"), 0.02)).head.getLong(0)
    val relErr = math.abs(approx - exact).toDouble / exact
    assert(relErr < 0.05, s"approx $approx vs exact $exact (rel err $relErr)")
  }

  test("approx_percentile with tight accuracy brackets the exact percentile") {
    val li = Tables.lineitem(spark, sf0001)
    val exact = li.select(expr("percentile(l_extendedprice, 0.5)")).head.getDouble(0)
    val approx = li.select(
      expr("approx_percentile(l_extendedprice, 0.5, 10000)")).head.getDouble(0)
    // exact rank error at accuracy=10000 on a few-thousand-row table is 0;
    // allow a tiny value-level tolerance for interpolation differences
    assert(math.abs(approx - exact) / exact < 0.01,
      s"approx $approx vs exact $exact")
  }

  test("sketches aggregate partially (map-side combine) like any codegen agg") {
    val ev = Tables.events(spark, sf0001)
    val df = ev.groupBy("event_type").agg(approx_count_distinct(col("user_id")).as("u"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_approx_count_distinct"),
      s"no partial aggregation for HLL sketch:\n$plan")
  }
}
