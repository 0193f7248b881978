package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._

/** SimHash-64 as a native Catalyst aggregate: buffer = 64 bit-vote
  * counters, updated from two 32-bit halves of each element's md5
  * (Portable.h32 / h32b). One pass, partial-aggregable (map-side combine),
  * no row explosion — replaces the 64× explode + two groupBys of the
  * expression-level formulation, which is the classic use case for
  * `TypedImperativeAggregate` (mutable sketch buffer).
  *
  * Semantics are identical to the DuckDB oracle: per bit j, majority vote
  * of `(h >> j) & 1` over elements (+1/−1, ties → 0); lo packs h1's bits,
  * hi packs h2's.
  */
case class SimHashAgg(
    h1: Expression,
    h2: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(h1, h2)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("simhash_hi", LongType, nullable = false),
    StructField("simhash_lo", LongType, nullable = false)))

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val a = h1.eval(input)
    val b = h2.eval(input)
    if (a != null && b != null) {
      val v1 = a.asInstanceOf[Long]
      val v2 = b.asInstanceOf[Long]
      var j = 0
      while (j < 32) {
        buf(j) += (if (((v1 >> j) & 1L) == 1L) 1 else -1)
        buf(32 + j) += (if (((v2 >> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Int]): Any = {
    var lo = 0L; var hi = 0L
    var j = 0
    while (j < 32) {
      if (buf(j) > 0) lo |= (1L << j)
      if (buf(32 + j) > 0) hi |= (1L << j)
      j += 1
    }
    InternalRow(hi, lo)
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 4)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getInt())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(h1 = newChildren(0), h2 = newChildren(1))
}

object SimHashAgg {
  /** Column-level entry point: `simhash_agg(h1, h2)` → struct(hi, lo). */
  def apply(h1: Column, h2: Column): Column =
    ColumnShim.column(
      SimHashAgg(
        ColumnShim.expression(h1),
        ColumnShim.expression(h2)).toAggregateExpression())
}
