package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native loop expressions for the BIGINT-vector hot paths (r19
  * optimization, guide §4 "eliminate non-codegen expressions in the hot
  * path" — with a twist: the previous formulation WAS codegen, but as one
  * flat 64-term arithmetic tree whose generated method exceeded HotSpot's
  * ~8 KB JIT ceiling (`-XX:DontCompileHugeMethods` default), so every row
  * executed INTERPRETED bytecode. Measured on ann_sq8 at sf0.1: the SQ8
  * pre-rank stage was a 1.06 s single task for 16k scored rows (~66 µs /
  * 64-term integer dot); as a compiled loop the same stage is
  * sub-millisecond-per-thousand-rows. The loop bodies below are tens of
  * bytecodes — always JIT-compiled, zero per-row allocation.
  *
  * Numeric contract (oracle parity): sequential left-to-right
  * accumulation over j = 1..dim, exactly the fold order of the
  * `(1 to dim).map(...).reduce(_ + _)` trees they replace — BIGINT adds
  * and multiplies are order-exact and wrap identically, so gate hashes
  * are unchanged. NULL/error semantics mirror the element_at formulation
  * they replace under the session's ANSI default: a NULL array or a NULL
  * element in the first `dim` positions yields NULL; an array SHORTER
  * than `dim` throws (ANSI element_at raises on out-of-bounds — the loud
  * contract the repo prefers anyway). Pinned against the old formulation
  * in CustomExpressionsSpec.
  */

/** Σ_{j<dim} (off_j + a_j·w_j) · (off_j + b_j·w_j) over two
  * array<bigint> columns with literal per-dimension (off, w) — the SQ8
  * symmetric reconstruction dot ([[graft.functions.Similarity]] sq8Dot:
  * off_j = mn_j·Levels). */
case class Sq8ReconDot(left: Expression, right: Expression,
    off: Seq[Long], w: Seq[Long]) extends BinaryExpression {

  require(off.length == w.length, s"off/w length ${off.length} != ${w.length}")
  private def dim = off.length
  // ADVICE r19: positional Seq access would make the interpreted path
  // O(dim^2) per row for a List-backed Seq — index primitive copies
  // instead (constructor params stay Seq: Array fields would break the
  // case class's canonicalized plan equality)
  @transient private lazy val offA: Array[Long] = off.toArray
  @transient private lazy val wA: Array[Long] = w.toArray

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sq8_recon_dot requires (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() < dim || y.numElements() < dim)
      throw new IllegalArgumentException(
        s"sq8_recon_dot: array length ${math.min(x.numElements(), y.numElements())} < dim $dim")
    var s = 0L
    var j = 0
    while (j < dim) {
      if (x.isNullAt(j) || y.isNullAt(j)) return null
      s += (offA(j) + x.getLong(j) * wA(j)) * (offA(j) + y.getLong(j) * wA(j))
      j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val offRef = ctx.addReferenceObj("sq8Off", off.toArray, "long[]")
      val wRef = ctx.addReferenceObj("sq8W", w.toArray, "long[]")
      val offArr = ctx.freshName("off")
      val wArr = ctx.freshName("w")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      s"""
         |long[] $offArr = $offRef;
         |long[] $wArr = $wRef;
         |if ($a.numElements() < ${dim} || $b.numElements() < ${dim}) {
         |  throw new IllegalArgumentException(
         |    "sq8_recon_dot: array length " +
         |      java.lang.Math.min($a.numElements(), $b.numElements()) +
         |      " < dim ${dim}");
         |}
         |long $s = 0L;
         |for (int $j = 0; $j < ${dim}; $j++) {
         |  if ($a.isNullAt($j) || $b.isNullAt($j)) { ${ev.isNull} = true; break; }
         |  $s += ($offArr[$j] + $a.getLong($j) * $wArr[$j]) *
         |    ($offArr[$j] + $b.getLong($j) * $wArr[$j]);
         |}
         |if (!${ev.isNull}) { ${ev.value} = $s; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Sq8ReconDot =
    copy(left = newLeft, right = newRight)
}

object Sq8ReconDot {
  def apply(a: Column, b: Column, off: Seq[Long], w: Seq[Long]): Column =
    ColumnShim.column(Sq8ReconDot(
      ColumnShim.expression(a), ColumnShim.expression(b), off, w))
}

/** Σ_{j<dim} a_j · x_j over an array<bigint> column and a literal BIGINT
  * vector — the projection dot of the PCA power-iteration family
  * ([[graft.functions.Similarity]] pcaDot). */
case class LitDotLong(child: Expression, x: Seq[Long]) extends UnaryExpression {

  private def dim = x.length
  // ADVICE r19: see Sq8ReconDot — O(dim) interpreted eval regardless of
  // the Seq implementation behind the constructor param
  @transient private lazy val xA: Array[Long] = x.toArray

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lit_dot_long requires array<bigint>, got ${other.simpleString}")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    if (v.numElements() < dim)
      throw new IllegalArgumentException(
        s"lit_dot_long: array length ${v.numElements()} < dim $dim")
    var s = 0L
    var j = 0
    while (j < dim) {
      if (v.isNullAt(j)) return null
      s += v.getLong(j) * xA(j)
      j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xRef = ctx.addReferenceObj("litX", x.toArray, "long[]")
      val xArr = ctx.freshName("x")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      s"""
         |long[] $xArr = $xRef;
         |if ($a.numElements() < ${dim}) {
         |  throw new IllegalArgumentException(
         |    "lit_dot_long: array length " + $a.numElements() + " < dim ${dim}");
         |}
         |long $s = 0L;
         |for (int $j = 0; $j < ${dim}; $j++) {
         |  if ($a.isNullAt($j)) { ${ev.isNull} = true; break; }
         |  $s += $a.getLong($j) * $xArr[$j];
         |}
         |if (!${ev.isNull}) { ${ev.value} = $s; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LitDotLong =
    copy(child = newChild)
}

object LitDotLong {
  def apply(a: Column, x: Seq[Long]): Column =
    ColumnShim.column(LitDotLong(ColumnShim.expression(a), x))
}
