package graft

import org.apache.spark.sql.functions._

/** Guards the scaling-evidence methodology: ScaleGen's replication
  * must actually produce the linear-work-by-construction corpora the
  * SCALE.md exponent table assumes — row counts ×f, offset keys
  * DISJOINT across replicas (graph copies, not densification), and
  * document replicas disjoint in token space (dup-cluster COUNT
  * scales, not cluster size).
  */
class ScaleGenSpec extends SparkTestBase {

  test("lineitem replication: rows x f, order and part key ranges disjoint per replica") {
    val base = Tables.lineitem(spark, sf0001)
    val rep = ScaleGen.replicate(base, 3, Seq("l_orderkey", "l_partkey"))
      .localCheckpoint()
    assert(rep.count() == base.count() * 3)
    val Seq(maxO, maxP) = Seq("l_orderkey", "l_partkey").map(c =>
      base.agg(max(col(c))).head().getLong(0))
    // replica r's keys live in (r·(max+1), (r+1)·(max+1)] windows —
    // assigning each row to a replica by its order key must put its
    // part key in the SAME replica window (disjoint graph copies)
    val mixed = rep.filter(
      expr(s"l_orderkey div ${maxO + 1} != l_partkey div ${maxP + 1}")).count()
    assert(mixed == 0L, s"$mixed rows straddle replica key windows")
    assert(rep.select(expr(s"l_orderkey div ${maxO + 1}")).distinct().count() == 3)
  }

  test("part replication joins lineitem replication without loss (q85 corpus invariant)") {
    // the invariant ScaleGen's loud require protects: part and lineitem
    // replicate with the SAME offset base, so every replicated lineitem
    // row still finds its part — the per-replica join count is exactly
    // the base join count, f times over
    val li = Tables.lineitem(spark, sf0001).select("l_orderkey", "l_partkey")
    val pt = Tables.part(spark, sf0001).select("p_partkey")
    val lMax = li.agg(max(col("l_partkey"))).head().getLong(0)
    val pMax = pt.agg(max(col("p_partkey"))).head().getLong(0)
    assert(lMax == pMax, "offset bases diverge on the gate corpus itself")
    val baseJoin = li.join(pt, li("l_partkey") === pt("p_partkey")).count()
    val liR = ScaleGen.replicate(li, 3, Seq("l_orderkey", "l_partkey"))
    val ptR = ScaleGen.replicate(pt, 3, Seq("p_partkey"))
    val repJoin = liR.join(ptR, liR("l_partkey") === ptR("p_partkey")).count()
    assert(repJoin == baseJoin * 3,
      s"replica join lost rows: $repJoin != 3 * $baseJoin")
  }

  test("documents replication: token space disjoint across replicas") {
    val base = Tables.documents(spark, sf0001)
    val maxId = base.agg(max(col("doc_id"))).head().getLong(0)
    val rep = ScaleGen.replicate(base, 2, Seq("doc_id"),
      rewrite = d => d.withColumn("text",
        when(col("r") === 0L, col("text")).otherwise(
          array_join(
            transform(split(col("text"), " "),
              w => concat(w, lit("_r"), col("r").cast("string"))), " "))))
      .localCheckpoint()
    assert(rep.count() == base.count() * 2)
    def toks(replica: Int) = rep
      .filter(expr(s"doc_id div ${maxId + 1} = $replica"))
      .select(explode(split(col("text"), " ")).as("w"))
      .distinct()
    // zero shared tokens ⇒ zero shared shingles ⇒ the LSH candidate
    // structure of each replica is independent of the others
    assert(toks(0).join(toks(1), Seq("w"), "left_semi").count() == 0L)
    // and replica 0 is the base corpus byte-identical
    val origTexts = base.select(col("doc_id"), col("text"))
    val r0Texts = rep.filter(expr(s"doc_id div ${maxId + 1} = 0"))
      .select(col("doc_id"), col("text"))
    assert(r0Texts.exceptAll(origTexts).count() == 0L)
  }
}
