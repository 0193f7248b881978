package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Packed k-means assignment word `min_c(dist(vec, cents[c])·16 + c)` as
  * a native Catalyst expression — the Lloyd inner loop.
  *
  * Why an expression and not an unrolled literal tree: the unrolled
  * k·dim subtract-square-add tree inlines every centroid coordinate as
  * a Java constant, so EVERY Lloyd round emits different codegen source
  * and pays a multi-second janino compile (measured: ~15 s cold for 4
  * rounds at k=8, dim=64 — compile-bound, the data work is
  * milliseconds). Here the centroid table is a non-primitive Literal,
  * which codegen routes through the `references` array — the generated
  * source is IDENTICAL across rounds, so the compiled class is reused
  * from the first round's cache and each subsequent round pays zero
  * compile. At 100 TB both shapes scan equally fast (tight fused loop);
  * the expression form just deletes the per-round driver stall.
  *
  * Numeric contract (oracle parity): integer squared distance
  * Σ(e_j − c_j)², packed as dist·16 + cluster so min() ties to the
  * smaller cluster id — exactly the DuckDB oracle's
  * `min(dist * 16 + cluster)`.
  */
case class KmeansPackedMin(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(ArrayType(LongType, _), _)) => true
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmeans_packed_min requires (array<bigint>, array<array<bigint>>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(v: Any, cs: Any): Any = {
    val e = v.asInstanceOf[ArrayData]
    val cents = cs.asInstanceOf[ArrayData]
    if (cents.numElements() > KmeansPackedMin.MaxCentroids)
      throw new IllegalArgumentException(KmeansPackedMin.arityMessage(cents.numElements()))
    var best = Long.MaxValue
    var c = 0
    while (c < cents.numElements()) {
      val cent = cents.getArray(c)
      val n = math.min(e.numElements(), cent.numElements())
      var d = 0L
      var j = 0
      while (j < n) {
        val diff = e.getLong(j) - cent.getLong(j)
        d += diff * diff
        j += 1
      }
      val packed = d * 16L + c
      if (packed < best) best = packed
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (e, cs) => {
      val best = ctx.freshName("best")
      val c = ctx.freshName("c")
      val cent = ctx.freshName("cent")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val j = ctx.freshName("j")
      val diff = ctx.freshName("diff")
      val packed = ctx.freshName("packed")
      s"""
         |if ($cs.numElements() > ${KmeansPackedMin.MaxCentroids}) {
         |  throw new IllegalArgumentException(
         |    graft.functions.expressions.KmeansPackedMin.arityMessage($cs.numElements()));
         |}
         |long $best = Long.MAX_VALUE;
         |for (int $c = 0; $c < $cs.numElements(); $c++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $cent = $cs.getArray($c);
         |  int $n = java.lang.Math.min($e.numElements(), $cent.numElements());
         |  long $d = 0L;
         |  for (int $j = 0; $j < $n; $j++) {
         |    long $diff = $e.getLong($j) - $cent.getLong($j);
         |    $d += $diff * $diff;
         |  }
         |  long $packed = $d * 16L + (long) $c;
         |  if ($packed < $best) $best = $packed;
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmeansPackedMin =
    copy(left = newLeft, right = newRight)
}

object KmeansPackedMin {
  /** The pack word is dist·16 + cluster — a valid (dist, cluster)
    * lexicographic order ONLY while cluster ids fit below the pack
    * factor. 17+ centroids would silently corrupt both the argmin and
    * the caller's `% 16` decode, so the bound fails loudly instead. */
  final val MaxCentroids = 16

  /** Shared by interpreted eval and generated code (called from janino). */
  def arityMessage(n: Int): String =
    s"kmeans_packed_min supports at most $MaxCentroids centroids " +
      s"(packed word is dist*16+cluster), got $n"

  /** Column-level entry point: `kmeans_packed_min(vec, centsLiteral)`. */
  def apply(vec: Column, cents: Column): Column =
    ColumnShim.column(
      KmeansPackedMin(ColumnShim.expression(vec), ColumnShim.expression(cents)))
}
