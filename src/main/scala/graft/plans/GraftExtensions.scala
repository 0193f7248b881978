package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.expressions.CosineSimilarity

/** SparkSessionExtensions hook exposing graft's native expressions to SQL:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * spark.sql("SELECT cosine_sim(a.embedding, b.embedding) FROM ...")
  * }}}
  *
  * (or `spark.sql.extensions=graft.plans.GraftExtensions`). The reference
  * has no SQL surface at all; this is the Spark-idiomatic way a library
  * ships operators into the SQL dialect without forking the parser.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
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
  }
}
