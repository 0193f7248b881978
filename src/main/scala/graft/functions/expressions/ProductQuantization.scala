package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._

/** Product-quantization primitives (Jégou et al., "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011) as native Catalyst
  * expressions — the compressed-vector scoring path every
  * billion-vector ANN index (FAISS IVF-PQ) runs: vectors are encoded as
  * `m` sub-space codebook indices (here 8 bytes instead of 256 floats),
  * and query scoring reads codebook entries instead of raw vectors.
  *
  * Numeric contract (oracle parity): all arithmetic is double-precision
  * sequential left-to-right accumulation — sub-distance `Σ_j (v−c)²`
  * with j ascending, ADC score `Σ_m Σ_j q·c` with m outer-ascending,
  * j inner-ascending — exactly the fold order DuckDB's nested
  * `list_reduce(list_transform(range(..)))` produces, so codes and
  * scores match bit-for-bit.
  *
  * Both expressions are CodegenFallback: each runs once per row (encode)
  * or once per candidate pair (score) with an internal fused loop, so
  * the interpretation overhead is amortized over `m·k·sub` arithmetic
  * ops — the expensive thing is the math, not the dispatch.
  */
private[expressions] object Pq {
  /** Centroids literal must be array<array<float>>. */
  def checkCentroids(t: DataType, what: String): TypeCheckResult = t match {
    case ArrayType(ArrayType(FloatType, _), _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$what requires centroids array<array<float>>, got ${other.simpleString}")
  }

  def checkVec(t: DataType, what: String): TypeCheckResult = t match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$what requires array<float>, got ${other.simpleString}")
  }
}

/** `pq_codes(vec, centroids)`: the vector's `m` sub-space codes — for
  * each of the `m` equal slices of the dimensions, the index (0-based,
  * ties to the lowest index) of the centroid whose matching slice is
  * L2-nearest. Centroids are a K-row literal (collected driver-side
  * from a deterministic corpus pick — K·dim floats, broadcast by value
  * inside the plan), so encoding is a zero-shuffle per-row map. */
case class PqCodes(vec: Expression, cents: Expression, m: Int)
    extends BinaryExpression with CodegenFallback {

  override def left: Expression = vec
  override def right: Expression = cents
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    Pq.checkVec(vec.dataType, prettyName) match {
      case TypeCheckResult.TypeCheckSuccess => Pq.checkCentroids(cents.dataType, prettyName)
      case fail => fail
    }

  override def nullSafeEval(v: Any, c: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val cs = c.asInstanceOf[ArrayData]
    val k = cs.numElements()
    val dim = x.numElements()
    val sub = dim / m
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      val off = mi * sub
      var best = 0
      var bestD = Double.MaxValue
      var ci = 0
      while (ci < k) {
        val cv = cs.getArray(ci)
        var d = 0.0
        var j = 0
        while (j < sub) {
          val diff = x.getFloat(off + j).toDouble - cv.getFloat(off + j).toDouble
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = ci }
        ci += 1
      }
      codes(mi) = best
      mi += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqCodes =
    copy(vec = newLeft, cents = newRight)
}

object PqCodes {
  def apply(vec: Column, cents: Column, m: Int): Column =
    ColumnShim.column(
      PqCodes(ColumnShim.expression(vec), ColumnShim.expression(cents), m))
}

/** `pq_adc_score(query, codes, centroids)`: asymmetric-distance inner
  * product — the query stays full-precision, the candidate is
  * represented only by its codes, and the score is
  * `Σ_m  q[slice m] · centroid[codes[m]][slice m]`. At scale the
  * per-query `m·k` partial dot products are a table computed once and
  * reused across the whole scan (FAISS's ADC tables); here each pair
  * recomputes the slice dot — same arithmetic, same result, and the
  * candidate's floats are never read. */
case class PqAdcScore(qv: Expression, codes: Expression, cents: Expression, m: Int)
    extends TernaryExpression with CodegenFallback {

  override def first: Expression = qv
  override def second: Expression = codes
  override def third: Expression = cents
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    Pq.checkVec(qv.dataType, prettyName) match {
      case TypeCheckResult.TypeCheckSuccess => second.dataType match {
        case ArrayType(IntegerType, _) => Pq.checkCentroids(cents.dataType, prettyName)
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires codes array<int>, got ${other.simpleString}")
      }
      case fail => fail
    }

  override def nullSafeEval(q: Any, cd: Any, c: Any): Any = {
    val x = q.asInstanceOf[ArrayData]
    val codes = cd.asInstanceOf[ArrayData]
    val cs = c.asInstanceOf[ArrayData]
    val dim = x.numElements()
    val sub = dim / m
    var score = 0.0
    var mi = 0
    while (mi < m) {
      val cv = cs.getArray(codes.getInt(mi))
      val off = mi * sub
      var s = 0.0
      var j = 0
      while (j < sub) {
        s += x.getFloat(off + j).toDouble * cv.getFloat(off + j).toDouble
        j += 1
      }
      score += s
      mi += 1
    }
    score
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): PqAdcScore =
    copy(qv = newFirst, codes = newSecond, cents = newThird)
}

object PqAdcScore {
  def apply(qv: Column, codes: Column, cents: Column, m: Int): Column =
    ColumnShim.column(
      PqAdcScore(ColumnShim.expression(qv), ColumnShim.expression(codes),
        ColumnShim.expression(cents), m))
}
