package graft

import org.apache.spark.sql.functions._

import graft.functions.Similarity

/** Semantics of the SemDeDup-style clustered embedding dedup
  * (`dedup_semantic`) beyond the planted-pair driver gate: soundness
  * (every drop is a genuine ≥-threshold near-duplicate of a kept lower
  * id) and exactness against the brute-force all-pairs drop set at a
  * scale where brute force is computable — the two properties the
  * cluster-bounded candidate space must not break.
  */
class SemanticDedupSpec extends SparkTestBase {

  /** Driver-side brute-force drop set: ids with ANY lower-id partner at
    * cosine ≥ the threshold, over the full (tiny) sf0.001 corpus. */
  private lazy val bruteDrops: Set[Long] = {
    val vecs = Similarity.corpusWithNearDupVectors(spark, sf0001)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .sortBy(_._1)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    (for {
      j <- vecs.indices
      i <- 0 until j
      if cos(vecs(i)._2, vecs(j)._2) >= Similarity.EmbDupThreshold
    } yield vecs(j)._1).toSet
  }

  private lazy val semanticDrops: Set[Long] =
    Similarity.dedupSemanticDrops(spark, sf0001)
      .collect().map(_.getLong(0)).toSet

  test("sound: every semantic drop is a brute-force ≥-threshold duplicate") {
    val unjustified = semanticDrops -- bruteDrops
    assert(unjustified.isEmpty,
      s"drops with no ≥-threshold lower-id partner: $unjustified")
  }

  test("complete on planted pairs, and exact vs brute force at sf0.001") {
    val planted = Similarity.corpusWithNearDupVectors(spark, sf0001)
      .filter(col("vec_id") >= Similarity.PlantOffset)
      .collect().map(_.getLong(0)).toSet
    assert((planted -- semanticDrops).isEmpty,
      s"planted copies missed: ${planted -- semanticDrops}")
    // On this corpus the only ≥-threshold pairs are the planted ones
    // (random vectors stay below ~0.5 cosine), so the cluster-bounded
    // drop set must equal the brute-force drop set exactly.
    assert(semanticDrops == bruteDrops,
      s"semantic ${semanticDrops.size} vs brute ${bruteDrops.size}")
  }
}
