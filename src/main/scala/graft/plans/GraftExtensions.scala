package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.expressions._

/** SparkSessionExtensions hook exposing graft's native expressions to SQL:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * spark.sql("SELECT cosine_sim(a.embedding, b.embedding) FROM ...")
  * spark.sql("SELECT simhash64(word_shingles(split(lower(text), '\\s+'))) FROM docs")
  * }}}
  *
  * (or `spark.sql.extensions=graft.plans.GraftExtensions`). The reference
  * has no SQL surface at all; this is the Spark-idiomatic way a library
  * ships operators into the SQL dialect without forking the parser.
  * Every registered expression overrides `checkInputDataTypes`, so a
  * wrong-typed SQL call is an analysis error, not silent garbage.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def unary(
      e: SparkSessionExtensions, name: String, usage: String)(
      build: Expression => Expression): Unit =
    e.injectFunction((
      new FunctionIdentifier(name),
      new ExpressionInfo(getClass.getName, null, name, usage, ""),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, s"$name requires exactly 1 argument, got ${exprs.length}")
        build(exprs.head)
      }))

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => AsOfJoin.AsOfJoinStrategy)
    e.injectOptimizerRule(_ => AsOfJoin.PushFilterThroughAsOfJoin)
    e.injectOptimizerRule(_ => AsOfJoin.PruneAsOfJoinColumns)
    e.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(
        classOf[CosineSimilarity].getName, null, "cosine_sim",
        "cosine_sim(a, b) - cosine similarity of two float vectors", ""),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"cosine_sim requires exactly 2 arguments (array<float>, array<float>), got ${exprs.length}")
        CosineSimilarity(exprs.head, exprs(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("kmeans_packed_min"),
      new ExpressionInfo(
        classOf[KmeansPackedMin].getName, null, "kmeans_packed_min",
        "kmeans_packed_min(vec, cents) - min over clusters of " +
          "squared-distance*16+cluster (Lloyd assignment word); " +
          "cents must hold at most 16 centroids (the pack factor)", ""),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"kmeans_packed_min requires (array<bigint>, array<array<bigint>>), got ${exprs.length} arguments")
        KmeansPackedMin(exprs.head, exprs(1))
      }))
    unary(e, "word_shingles",
      "word_shingles(tokens) - word 3-gram shingles of a token array")(WordShingles(_))
    unary(e, "simhash64",
      "simhash64(shingles) - struct(simhash_hi, simhash_lo) SimHash-64 of a string array")(SimHash64(_))
    unary(e, "minhash64",
      "minhash64(shingles) - 64-lane MinHash signature of a string array")(MinHash64(_))
    unary(e, "rolling_fingerprint",
      "rolling_fingerprint(tokens) - order-sensitive md5 polynomial fold mod 1e9+7")(RollingFingerprint(_))
    unary(e, "shingle_hash_pairs",
      "shingle_hash_pairs(shingles) - array of (h32, h32b) md5 pairs")(ShingleHashPairs(_))
    e.injectFunction((
      new FunctionIdentifier("topk_sketch"),
      new ExpressionInfo(
        classOf[TopKSketchAgg].getName, null, "topk_sketch",
        "topk_sketch(items, capacity, k) - SpaceSaving heavy-hitters aggregate: " +
          "array<struct<item, count_lo, count_hi>>", ""),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3,
          s"topk_sketch requires (column, capacity, k), got ${exprs.length} arguments")
        def intLit(e: Expression, name: String): Int = {
          require(e.foldable, s"topk_sketch $name must be a literal")
          e.eval() match {
            case i: Int => i
            case l: Long => l.toInt
            case other => throw new IllegalArgumentException(
              s"topk_sketch $name must be an integer literal, got $other")
          }
        }
        TopKSketchAgg(
          exprs.head,
          intLit(exprs(1), "capacity"),
          intLit(exprs(2), "k")).toAggregateExpression()
      }))
  }
}
