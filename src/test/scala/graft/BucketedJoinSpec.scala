package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located joins — the pre-shuffle answer for joins that
  * repeat on the same key (fact ⋈ fact, incremental loads joining a
  * reference table): both sides written `bucketBy(n, key)` +
  * `sortBy(key)` make the join ZERO-exchange (and zero-sort when each
  * bucket is one file), because the on-disk layout IS the required
  * hash distribution. At 100 TB this converts every repeated join on
  * the bucket key from a full shuffle into a local merge — the same
  * contract AsOfJoinExec declares at runtime, persisted into storage.
  */
class BucketedJoinSpec extends SparkTestBase {

  test("bucketed+sorted tables join with zero exchanges and zero sorts") {
    val s = spark
    val conf = spark.conf
    val savedThreshold = conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    val savedOrdering = conf.getOption("spark.sql.legacy.bucketedTableScan.outputOrdering")
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      // since 3.0 the scan only REPORTS the per-bucket sort order behind
      // this flag (safe exactly when each bucket is one file, which the
      // pre-write repartition guarantees here)
      conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      val orders = Tables.orders(spark, sf0001)
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val customer = Tables.customer(spark, sf0001)
        .select("c_custkey", "c_mktsegment")
      // one file per bucket (repartition on the bucket key first) so the
      // reader also gets the per-bucket sort order for free
      orders.repartition(4, col("o_custkey")).write
        .bucketBy(4, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("orders_bucketed")
      customer.repartition(4, col("c_custkey")).write
        .bucketBy(4, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable("customer_bucketed")

      val joined = spark.table("orders_bucketed")
        .join(spark.table("customer_bucketed"),
          col("o_custkey") === col("c_custkey"))
      val n = joined.collect().length
      // every order has a customer; the plain join agrees
      val expected = orders.join(customer, col("o_custkey") === col("c_custkey")).count()
      assert(n == expected, s"bucketed join returned $n rows, plain join $expected")

      val plan = joined.queryExecution.executedPlan.toString
      val finalPlan = plan.split("== Initial Plan ==").head
      assert(!finalPlan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(!finalPlan.contains("Sort "),
        s"bucketed+sorted join still sorts:\n$plan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS customer_bucketed")
      savedThreshold match {
        case Some(v) => conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None => conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
      savedOrdering match {
        case Some(v) => conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", v)
        case None => conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
      }
    }
  }
}
