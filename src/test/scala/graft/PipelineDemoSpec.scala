package graft

import graft.examples.PipelineDemo
import graft.functions.Dedup

/** The composed curation pipeline: stage gates only remove rows, the
  * final corpus respects every gate, and the run is reproducible. */
class PipelineDemoSpec extends SparkTestBase {

  test("vector pipeline: drops planted duplicates, keeps surviving exemplars flagged") {
    import org.apache.spark.sql.functions._
    import graft.functions.Similarity
    val (curated, counts) = examples.VectorPipelineDemo.curate(spark, sf0001)
    val m = counts.toMap
    // every planted copy is a semantic drop, so curated = raw − drops
    assert(m("curated") == m("raw") - m("semantic_drops"))
    assert(m("semantic_drops") > 0)
    assert(!curated.filter(col("vec_id") >= Similarity.PlantOffset)
      .collect().exists(_ => true), "a planted copy survived curation")
    // k-center exemplars that weren't dropped carry the flag
    val exemplarIds = Similarity.sampleKcenter(spark, sf0001)
      .collect().map(_.getLong(1)).toSet
    val flagged = curated.filter(col("is_exemplar") === 1L)
      .collect().map(_.getLong(0)).toSet
    assert(flagged.subsetOf(exemplarIds) && flagged.nonEmpty)
  }

  test("curation pipeline composes the operator gates consistently") {
    val (curated, counts) = PipelineDemo.curate(spark, sf0001)
    val m = counts.toMap
    assert(m("curated") > 0, "pipeline curated nothing")
    assert(m("curated") <= m("sampled_10pct"))
    assert(m("curated") <= m("near_keep"))
    assert(m("curated") <= m("decontaminated"))
    assert(m("curated") <= m("budget_admitted"))
    assert(m("raw") == 500)
    // the terminal packing stage emits at least one training sequence
    // per non-empty source and never more than one per curated doc
    assert(m("packed_sequences") > 0 && m("packed_sequences") <= m("curated"))

    // no quarantined doc survives into the curated corpus
    val quarantined = Dedup.decontaminate(spark, sf0001)
      .filter(org.apache.spark.sql.functions.col("action") === "quarantine")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val curatedIds = curated.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(curatedIds.intersect(quarantined).isEmpty,
      "quarantined docs leaked into the curated corpus")

    val sampled = Dedup.sampleByHash(spark, sf0001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(curatedIds.subsetOf(sampled), "curated docs outside the reproducible sample")

    // deterministic: a second run produces the identical corpus
    val (curated2, _) = PipelineDemo.curate(spark, sf0001)
    val ids2 = curated2.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(curatedIds == ids2)
  }

  test("fused production plan == per-stage intersection (rows AND fingerprints)") {
    // the gate runs the fused plan (one corpus pass + small-side
    // joins); the per-stage form is the semantic reference — the two
    // must agree on the full output, not just the id set
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "lang", "source", "fingerprint")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toSet
    val fused = rows(PipelineDemo.curated(spark, sf0001))
    val staged = rows(PipelineDemo.curatedByStages(spark, sf0001))
    assert(fused.nonEmpty && fused == staged,
      s"fusion changed the survivor set: only-fused=${(fused -- staged).take(3)} " +
        s"only-staged=${(staged -- fused).take(3)}")
  }
}
