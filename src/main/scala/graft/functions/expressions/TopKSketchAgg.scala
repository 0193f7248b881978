package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.sketch.SpaceSaving

/** Approximate frequent-items aggregate over a string column: a
  * SpaceSaving sketch as the mutable buffer — map-side partial sketches
  * merged at the final stage, O(capacity) state per partial instead of
  * the full-vocabulary shuffle an exact top-k needs.
  *
  * Output: the top-`k` tracked items as
  * `array<struct<item, count_lo, count_hi>>` — `count_hi` is the
  * SpaceSaving estimate (never under the true count), `count_lo`
  * subtracts the tracked overestimation error (never over). Any item
  * with true count > n/capacity is guaranteed present
  * (TopKSketchSpec pins both guarantees against exact counts).
  */
case class TopKSketchAgg(
    child: Expression,
    capacity: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SpaceSaving] {

  require(capacity >= k && k > 0, "need capacity >= k > 0")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("count_lo", LongType, nullable = false),
      StructField("count_hi", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"topk_sketch requires a string column, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): SpaceSaving = new SpaceSaving(capacity)

  override def update(buf: SpaceSaving, input: InternalRow): SpaceSaving = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(b1: SpaceSaving, b2: SpaceSaving): SpaceSaving = b1.merge(b2)

  override def eval(buf: SpaceSaving): Any =
    new GenericArrayData(buf.topK(k).map { case (item, lo, hi) =>
      InternalRow(UTF8String.fromString(item), lo, hi)
    }.toArray[Any])

  override def serialize(buf: SpaceSaving): Array[Byte] = buf.serialized
  override def deserialize(bytes: Array[Byte]): SpaceSaving = SpaceSaving.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKSketchAgg =
    copy(child = newChildren.head)
}

object TopKSketchAgg {
  /** Column-level entry point: `topk_sketch(items, capacity, k)`. */
  def apply(item: Column, capacity: Int, k: Int): Column =
    ColumnShim.column(
      TopKSketchAgg(ColumnShim.expression(item), capacity, k).toAggregateExpression())
}
