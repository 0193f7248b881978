package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** The reference's `WindowAgg` as a typed Aggregator (SURVEY C15:
  * `/root/reference/.../windowAllPoCs/WindowAllKeyedPoC.java:20-33` folds a
  * window into (label = keys joined by "-", count = Σ values)).
  *
  * The reference's label is arrival-ordered and therefore nondeterministic
  * under parallelism (its own run logs show reorderings,
  * WindowAllTimeKeyedPoC.java:100-101); this version sorts the keys inside
  * the merge so the fold is commutative — the determinism the reference
  * wished it had (SURVEY §5). Register SQL-side with
  * `udaf(LabelSumAggregator)`.
  */
object LabelSumAggregator extends Aggregator[(String, Int), (Vector[String], Long), (String, Long)] {

  override def zero: (Vector[String], Long) = (Vector.empty, 0L)

  override def reduce(b: (Vector[String], Long), a: (String, Int)): (Vector[String], Long) =
    (b._1 :+ a._1, b._2 + a._2)

  override def merge(b1: (Vector[String], Long), b2: (Vector[String], Long)): (Vector[String], Long) =
    (b1._1 ++ b2._1, b1._2 + b2._2)

  override def finish(r: (Vector[String], Long)): (String, Long) =
    (r._1.sorted.mkString("-"), r._2)

  // product encoder, NOT javaSerialization: the buffer crosses the
  // partial-aggregate exchange on every row, and Java-serializing a
  // growing Vector there would dominate the aggregate's cost (and tie
  // the shuffle bytes to Scala's serialization format)
  override def bufferEncoder: Encoder[(Vector[String], Long)] =
    Encoders.product[(Vector[String], Long)]

  override def outputEncoder: Encoder[(String, Long)] =
    Encoders.tuple(Encoders.STRING, Encoders.scalaLong)
}
