package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._

import graft.functions.sketch.QuantileSketch

/** Approximate quantiles aggregate over a double column: a
  * [[QuantileSketch]] as the mutable buffer — map-side partial sketches,
  * level-wise merge, O(capacity·log(n/capacity)) state per partial
  * instead of percentile()'s full per-group value buffer.
  *
  * Output: `array<double>`, one nearest-rank quantile per requested
  * fraction. With capacity ≥ the group size the sketch never compacts
  * and every output is the EXACT nearest-rank statistic (the
  * approx_quantiles gate runs in that regime so plain ranked SQL is a
  * full hash oracle); the compacting regime's rank error is pinned in
  * QuantileSketchSpec against exact ranks under adversarial merge trees.
  */
case class QuantileSketchAgg(
    child: Expression,
    capacity: Int,
    fractions: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QuantileSketch] {

  require(fractions.nonEmpty && fractions.forall(q => q >= 0.0 && q <= 1.0),
    "fractions must be within [0, 1]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quantile_sketch requires a double column, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): QuantileSketch = new QuantileSketch(capacity)

  override def update(buf: QuantileSketch, input: InternalRow): QuantileSketch = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(b1: QuantileSketch, b2: QuantileSketch): QuantileSketch = b1.merge(b2)

  override def eval(buf: QuantileSketch): Any =
    new GenericArrayData(fractions.map(buf.quantile).toArray[Any])

  override def serialize(buf: QuantileSketch): Array[Byte] = buf.serialized
  override def deserialize(bytes: Array[Byte]): QuantileSketch =
    QuantileSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSketchAgg =
    copy(child = newChildren.head)
}

object QuantileSketchAgg {
  /** Column-level entry point: `quantile_sketch(values, capacity, qs)`. */
  def apply(values: Column, capacity: Int, fractions: Seq[Double]): Column =
    ColumnShim.column(
      QuantileSketchAgg(ColumnShim.expression(values), capacity, fractions)
        .toAggregateExpression())
}
