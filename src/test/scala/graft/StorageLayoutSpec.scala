package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The two storage-layout levers that matter at 100 TB, demonstrated and
  * plan-asserted on real testdata:
  *
  *  - **Bucketing**: pre-hash-partitioned tables joined on their bucket
  *    key need NO exchange at join time — the shuffle is paid once at
  *    write time and amortized over every subsequent join. This is the
  *    co-located-join design the builder mandate calls out.
  *  - **Partition pruning**: a filter on the partition column prunes
  *    directories at planning time; the scan never opens non-matching
  *    files.
  */
class StorageLayoutSpec extends SparkTestBase {

  test("bucketed tables join with zero exchanges (co-located sort-merge join)") {
    // warehouse dir: /tmp/graft-warehouse (SparkTestBase static config,
    // wiped at session init); tables dropped below
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    // at sf0.001 both sides are broadcastable, which would hide the
    // co-located-join shape this test pins; force the SMJ path
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_extendedprice")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    Tables.orders(spark, sf0001)
      .select("o_orderkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_b")

    val joined = spark.table("li_b")
      .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey").agg(sum("l_extendedprice").as("s"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must consume bucketed scans directly: the only
    // allowed exchange is AFTER the join for the final aggregation — but
    // since the agg key IS the bucket key, even that one is elided
    assert(!plan.contains("Exchange"),
      s"expected a fully exchange-free plan over bucketed tables:\n$plan")
    assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
      s"scan does not report bucketed read:\n$plan")
    assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }

  test("bucketed+sorted tables with one file per bucket also skip the join sorts") {
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
      val expected = orders.join(customer,
        col("o_custkey") === col("c_custkey")).count()
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

  test("dynamic partition pruning: dim-side filter prunes fact partitions at runtime") {
    val dir = Files.createTempDirectory("graft_dpp").toString
    // fact: orders laid out by order year (the 100-TB date-partitioned
    // fact-table layout); synthetic orderdates span 1995–2001 → 7 dirs
    Tables.orders(spark, sf0001)
      .withColumn("o_year", year(col("o_orderdate")))
      .write.partitionBy("o_year").mode("overwrite").parquet(dir)
    // dim filter on a NON-partition attribute: static pruning cannot see
    // it — only runtime DPP (subquery/broadcast-reuse) can skip fact files
    val dim = spark.range(1990L, 2010L)
      .select(col("id").cast("int").as("d_year"), (col("id") % 2 === 0).as("is_even"))
    val fact = spark.read.parquet(dir)
    val q = fact.join(dim.filter(col("is_even")), col("o_year") === col("d_year"))
      .agg(count(lit(1)).as("n"))
    val n = q.collect().head.getLong(0)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression"),
      s"fact scan carries no runtime pruning predicate:\n$plan")
    // and the pruned join is value-correct vs the static-filter reference
    val expected = fact.filter(col("o_year") % 2 === 0).count()
    assert(n == expected, s"DPP join counted $n, static reference $expected")
  }

  test("partition pruning: filter on the partition column prunes at plan time") {
    val dir = Files.createTempDirectory("graft_partitioned").toString
    Tables.events(spark, sf0001)
      .write.partitionBy("event_type").mode("overwrite").parquet(dir)

    val df = spark.read.parquet(dir)
      .filter(col("event_type") === "purchase")
      .agg(count(lit(1)).as("n"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("event_type"),
      s"no partition filter in scan:\n$plan")
    // pruned scan reads strictly fewer files than the full table
    val full = spark.read.parquet(dir).count()
    val pruned = spark.read.parquet(dir)
      .filter(col("event_type") === "purchase").count()
    assert(pruned > 0 && pruned < full)
  }
}
