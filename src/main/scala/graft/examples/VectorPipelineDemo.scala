package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Similarity

/** End-to-end VECTOR-side curation — the embedding companion of
  * [[PipelineDemo]], composing the vector family the same way (every
  * stage an independent library operator, intersected at the end):
  *
  *   embedding corpus (with planted near-dup copies)
  *     → semantic dedup   (Similarity.dedupSemanticDrops: SemDeDup
  *                         learned-cluster near-dup drops, keep-lowest)
  *     → diversity seeds  (Similarity.sampleKcenter: greedy k-center
  *                         exemplars for labeling/eval set seeding)
  *     → class prototypes (Similarity.embedCentroids over survivors'
  *                         labels — drift monitoring baseline)
  *
  * The curated output is the corpus minus semantic duplicates, with
  * the k-center exemplars flagged — the shape an embedding-curation
  * job ships to the labeling/training stage.
  *
  * Run: sbt "runMain graft.examples.VectorPipelineDemo [sfDir]"
  */
object VectorPipelineDemo {

  /** Curated vectors (`is_exemplar` marks k-center picks) plus
    * per-stage counts. */
  def curate(spark: SparkSession, sfDir: String): (DataFrame, Seq[(String, Long)]) = {
    val corpus = Similarity.corpusWithNearDupVectors(spark, sfDir)
    val drops = Similarity.dedupSemanticDrops(spark, sfDir)
    val exemplars = Similarity.sampleKcenter(spark, sfDir)
      .select(col("vec_id"), lit(1L).as("is_exemplar"))
    val curated = corpus
      .join(drops, col("vec_id") === col("dup_id"), "left_anti")
      .join(exemplars, Seq("vec_id"), "left")
      .select(col("vec_id"), col("embedding"),
        coalesce(col("is_exemplar"), lit(0L)).as("is_exemplar"))
    val counts = Seq(
      "raw" -> corpus.count(),
      "semantic_drops" -> drops.count(),
      "curated" -> curated.count(),
      "exemplars_surviving" -> curated.filter(col("is_exemplar") === 1L).count())
    (curated, counts)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (curated, counts) = curate(spark, sfDir)
    counts.foreach { case (stage, n) => println(f"$stage%-22s $n") }
    curated.show(10)
    spark.stop()
  }
}
