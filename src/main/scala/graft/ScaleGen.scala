package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Builder-owned scaling corpora (VERDICT r12 item 5): replicates the
  * driver's sf0.1 tables ×1/×3/×10 into `/tmp/graft_scale/x{f}` so the
  * heavy operator family can be timed on a measured scaling TREND
  * instead of plan-reading alone. NOT test data for the gates — the
  * gates stay on the read-only driver corpora.
  *
  * Replication is key-offsetting, seeded by nothing (fully
  * deterministic), and designed so each query's WORK scales linearly
  * with the factor — the honest null hypothesis a super-linear fit
  * would falsify:
  *  - `lineitem`: replica k offsets l_orderkey AND l_partkey by
  *    k·(max+1) — the co-purchase graph becomes f DISJOINT copies of
  *    the base graph (nodes ×f, edges ×f, triangles ×f), so q55/q61
  *    scale in graph size, not in density (replicating only orders
  *    would collapse duplicate edges into a denser same-size graph);
  *  - `documents`: replica k offsets doc_id and suffixes EVERY word
  *    with `_r<k>` — replicas are disjoint in shingle space, so the
  *    near-dup cluster count scales ×f while cluster sizes (and the
  *    LSH candidate density) stay base-like; identical replica text
  *    would instead grow every dup cluster ×f and candidate pairs ×f²
  *    by corpus construction, not by algorithmic behavior;
  *  - `events`: replica k offsets event_id and user_id by k·(max+1) —
  *    same time span, ×f users and rows (how a real event log grows).
  *
  * Run: `sbt "runMain graft.ScaleGen [baseDir] [outRoot] [factors...]"`
  * then time lines with
  * `SPARK_GRAFT_SF_DIR=/tmp/graft_scale/x10 sbt "runMain graft.Bench
  * q55_triangles q61_pagerank dedup_minhash column_histogram_depth
  * streaming_ttl_pipeline"` (dev-filtered runs write BENCH_FULL_DEV,
  * never the canonical record). Results: SCALE.md round-13 table.
  */
object ScaleGen {

  /** Replicate `df` ×f, offsetting each column in `offsetCols` by
    * replica · (max+1); `rewrite` post-processes with the replica id
    * column `r` still present (for the documents word-suffix). */
  private[graft] def replicate(
      df: DataFrame, f: Int, offsetCols: Seq[String],
      rewrite: DataFrame => DataFrame = identity): DataFrame = {
    val maxes = df.agg(
      max(col(offsetCols.head)).as(offsetCols.head),
      offsetCols.tail.map(c => max(col(c)).as(c)): _*).head()
    val bases = offsetCols.zipWithIndex.map { case (c, i) => c -> (maxes.getLong(i) + 1L) }.toMap
    val rep = df.withColumn("r", explode(sequence(lit(0L), lit(f - 1L))))
    val offset = bases.foldLeft(rep) { case (d, (c, base)) =>
      d.withColumn(c, col(c) + col("r") * base)
    }
    rewrite(offset).drop("r").select(df.columns.map(col): _*)
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outRoot = args.lift(1).getOrElse("/tmp/graft_scale")
    val factors = if (args.length > 2) args.drop(2).map(_.toInt).toSeq else Seq(1, 3, 10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scalegen")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (f <- factors) {
      val dir = s"$outRoot/x$f"
      replicate(Tables.lineitem(spark, base), f, Seq("l_orderkey", "l_partkey"))
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      replicate(Tables.documents(spark, base), f, Seq("doc_id"),
        rewrite = d => d.withColumn("text",
          when(col("r") === 0L, col("text")).otherwise(
            array_join(
              transform(split(col("text"), " "),
                w => concat(w, lit("_r"), col("r").cast("string"))), " "))))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      replicate(
        spark.read.parquet(s"$base/events.parquet"), f,
        Seq("event_id", "user_id"))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      // embeddings: replica k offsets vec_id; vectors repeat verbatim
      // (scaling probes measure per-row cost — the analytics' work is
      // row-proportional regardless of vector novelty), and the
      // vec_id 0..k-1 anchor rows stay unique to replica 0
      replicate(Tables.embeddings(spark, base), f, Seq("vec_id"))
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      // part rides along for the q85 join: its p_partkey offset base
      // must equal lineitem's l_partkey base or replica joins silently
      // miss — the testdata generator keys lineitem over the full part
      // domain, which makes the two maxima equal; require it loudly
      // rather than trust it
      val lMax = Tables.lineitem(spark, base).agg(max(col("l_partkey"))).head().getLong(0)
      val pMax = Tables.part(spark, base).agg(max(col("p_partkey"))).head().getLong(0)
      require(lMax == pMax,
        s"partkey offset bases diverge (lineitem $lMax vs part $pMax); " +
          "replicate both with a shared explicit base before using x-corpora for part joins")
      replicate(Tables.part(spark, base), f, Seq("p_partkey"))
        .write.mode("overwrite").parquet(s"$dir/part.parquet")
      println(s"wrote $dir (x$f)")
    }
    spark.stop()
  }
}
