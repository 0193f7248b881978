package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._

/** 64-permutation MinHash signature as a native sketch aggregate: buffer =
  * 64 running minima of (a_j·h + b_j) mod p with a_j = 2j+1,
  * b_j = 1000003·j + 12345, p = 2^31−1 — the same permutation family as
  * the DuckDB oracle, which keeps the 64× row-explode formulation.
  *
  * Replaces an 18M-row explode+shuffle (at sf0.1) with one pass and
  * map-side partial merges; per-group state is a fixed 64-long buffer, so
  * the operator scales to arbitrarily many documents.
  */
case class MinHashAgg(
    h: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  import MinHashAgg._

  override def children: Seq[Expression] = Seq(h)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(Perms)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = h.eval(input)
    if (v != null) {
      val hv = v.asInstanceOf[Long]
      var j = 0
      while (j < Perms) {
        val m = ((2L * j + 1) * hv + 1000003L * j + 12345L) % P
        if (m < buf(j)) buf(j) = m
        j += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var j = 0
    while (j < Perms) { if (b2(j) < b1(j)) b1(j) = b2(j); j += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(Perms * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(Perms)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(h = newChildren.head)
}

object MinHashAgg {
  val Perms = 64
  val P: Long = 2147483647L

  /** Column-level entry point: `minhash_agg(h32)` → array<long>[64]. */
  def apply(h: Column): Column =
    ColumnShim.column(
      MinHashAgg(ColumnShim.expression(h)).toAggregateExpression())
}
