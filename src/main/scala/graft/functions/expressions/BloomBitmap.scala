package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Bloom-filter BITMAP aggregate: folds a column of bit positions
  * (already `pmod m`, the Kirsch–Mitzenmacher scheme of
  * [[graft.functions.Dedup.decontaminateBloom]]) into ONE m-bit byte
  * array — the production wire form of the benchmark-set filter. The
  * 2^20-position set that broadcasts as a ~4 MB row set collapses to a
  * 128 KB value; membership becomes a scalar bit test
  * ([[BloomBitTest]]) instead of a join, so the corpus side needs no
  * explode and no shuffle at all for the probe.
  *
  * State is the byte array itself (update sets a bit, merge ORs — both
  * map-side combinable); serialize is identity. Bit layout: position p
  * lives in byte p>>3 at bit p&7, the layout [[BloomBitTest]] reads.
  */
case class BloomBitmapAgg(
    pos: Expression,
    mBits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  require(mBits > 0 && mBits % 8 == 0, s"m must be a positive multiple of 8, got $mBits")

  override def children: Seq[Expression] = Seq(pos)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Array[Byte] =
    new Array[Byte](mBits / 8)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = pos.eval(input)
    if (v != null) {
      val p = v.asInstanceOf[Long]
      require(p >= 0 && p < mBits,
        s"bloom position $p outside [0, $mBits) — geometry mismatch")
      buf((p >> 3).toInt) = (buf((p >> 3).toInt) | (1 << (p & 7L).toInt)).toByte
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < b1.length) { b1(i) = (b1(i) | b2(i)).toByte; i += 1 }
    b1
  }

  override def eval(buf: Array[Byte]): Any = buf.clone()
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBitmapAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBitmapAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomBitmapAgg =
    copy(pos = newChildren.head)
}

object BloomBitmapAgg {
  /** `bloom_bitmap(pos, m)` → binary[m/8]. */
  def apply(pos: Column, mBits: Int): Column =
    ColumnShim.column(
      BloomBitmapAgg(ColumnShim.expression(pos), mBits).toAggregateExpression())
}

/** Bit test against a [[BloomBitmapAgg]] bitmap: `(bm[p>>3] >> (p&7)) & 1`
  * — codegen'd, zero allocation, so the k probes of every corpus shingle
  * stay inside the WholeStageCodegen span. An out-of-range position
  * throws (geometry mismatch must be loud — a silent false would be a
  * MISSED contamination, the one error class Bloom decontamination
  * promises never to make).
  */
case class BloomBitTest(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_bit_test requires (binary, bigint), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def nullSafeEval(bm: Any, p: Any): Any = {
    val bytes = bm.asInstanceOf[Array[Byte]]
    val pos = p.asInstanceOf[Long]
    if (pos < 0 || pos >= bytes.length.toLong * 8)
      throw new IllegalArgumentException(
        s"bloom position $pos outside [0, ${bytes.length * 8}) — geometry mismatch")
    ((bytes((pos >> 3).toInt) >> (pos & 7L).toInt) & 1) == 1
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bm, p) => {
      s"""
         |if ($p < 0 || $p >= ((long) $bm.length) * 8L) {
         |  throw new IllegalArgumentException(
         |    "bloom position " + $p + " outside [0, " + ($bm.length * 8) +
         |    ") — geometry mismatch");
         |}
         |${ev.value} = (($bm[(int) ($p >> 3)] >> (int) ($p & 7L)) & 1) == 1;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomBitTest =
    copy(left = newLeft, right = newRight)
}

object BloomBitTest {
  /** `bloom_bit_test(bm, pos)` → boolean. */
  def apply(bm: Column, pos: Column): Column =
    ColumnShim.column(
      BloomBitTest(ColumnShim.expression(bm), ColumnShim.expression(pos)))
}
