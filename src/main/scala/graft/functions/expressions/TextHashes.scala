package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared md5 plumbing for the native text-hash expressions.
  *
  * All graft hashing is md5-derived so DuckDB reproduces it (see
  * [[graft.functions.Portable]]): h32 = first 8 md5 hex chars as an
  * unsigned 32-bit value, h32b = hex chars 9–16. Here those are read
  * straight from the digest bytes — hex round-trip elided — which is
  * bit-identical: hex chars 1–8 ARE bytes 0–3 big-endian.
  *
  * A ThreadLocal digest instance avoids per-row MessageDigest.getInstance
  * (the dominant cost of the HOF `conv(substring(md5(..)))` chain after
  * interpretation overhead).
  */
private[graft] object Md5Hash {
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** (h32, h32b) of a UTF8String's bytes: digest bytes 0–3 and 4–7 as
    * unsigned big-endian 32-bit values. */
  def hashPair(s: UTF8String): (Long, Long) = hashPair(s.getBytes)

  /** Same over raw bytes (used by the multimodal decoder stub). */
  def hashPair(raw: Array[Byte]): (Long, Long) = {
    val d = md.get()
    d.reset()
    val bytes = d.digest(raw)
    (be32(bytes, 0), be32(bytes, 4))
  }

  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
}

private[expressions] trait RequiresStringArray { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = self.child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"${self.prettyName} requires array<string>, got ${other.simpleString}")
  }
}

/** Rolling polynomial fingerprint over a token array as ONE native eval:
  * fold h = (h*131 + h32(token)) mod 1e9+7, left to right.
  *
  * Replaces the `aggregate(transform(toks, h32), ...)` formulation: HOFs
  * are interpreted in Spark 4, so that chain paid per-token lambda
  * interpretation plus a full Catalyst md5/conv/substring expression tree
  * per element — the single biggest allocation source in the round-1
  * bench (text_fingerprint was its slowest line under driver load).
  * Value-identical to the HOF form and to DuckDB's list_reduce fold
  * (asserted in CustomExpressionsSpec).
  *
  * No overflow: acc < 1e9+7 < 2^30, acc*131 < 2^38, + h32 < 2^38+2^32.
  */
case class RollingFingerprint(child: Expression)
    extends UnaryExpression with CodegenFallback with RequiresStringArray {

  override def dataType: DataType = LongType
  // a NULL array element nulls the whole fold, exactly like the HOF
  // aggregate() formulation this replaces
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var h = 0L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val (h32, _) = Md5Hash.hashPair(arr.getUTF8String(i))
      h = (h * 131 + h32) % 1000000007L
      i += 1
    }
    h
  }

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}

object RollingFingerprint {
  def apply(tokens: Column): Column =
    ColumnShim.column(RollingFingerprint(ColumnShim.expression(tokens)))
}

/** SimHash-64 of a (already-distinct) shingle array as a per-ROW native
  * expression — no explode, no aggregation, no shuffle.
  *
  * SimHash is a per-document sketch: each document's signature depends
  * only on its own shingles, so expressing it as explode + groupBy (the
  * round-1 SimHashAgg pipeline) manufactured a shuffle that a 100 TB
  * corpus scan does not need. This form keeps the whole computation
  * map-side: documents → select(doc_id, simhash64(shingles)) runs at
  * scan speed with full column pruning.
  *
  * Semantics identical to SimHashAgg and the DuckDB oracle: per bit j,
  * majority vote of bit j over the shingles' h32 values (+1/−1, ties→0)
  * packs `simhash_lo`; same over h32b packs `simhash_hi`.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback with RequiresStringArray {

  override def dataType: DataType = StructType(Seq(
    StructField("simhash_hi", LongType, nullable = false),
    StructField("simhash_lo", LongType, nullable = false)))

  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val (h1, h2) = Md5Hash.hashPair(arr.getUTF8String(i))
      var j = 0
      while (j < 32) {
        votes(j) += (if (((h1 >> j) & 1L) == 1L) 1 else -1)
        votes(32 + j) += (if (((h2 >> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      i += 1
    }
    var lo = 0L; var hi = 0L
    var j = 0
    while (j < 32) {
      if (votes(j) > 0) lo |= (1L << j)
      if (votes(32 + j) > 0) hi |= (1L << j)
      j += 1
    }
    InternalRow(hi, lo)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def apply(shingles: Column): Column =
    ColumnShim.column(SimHash64(ColumnShim.expression(shingles)))
}

/** MinHash-64 signature of a shingle array as a per-ROW native
  * expression: for permutation j (0..63),
  * sig(j) = min over shingles of ((2j+1)·h32 + 1000003·j + 12345) mod
  * 2147483647 — the same family as MinHashAgg and the DuckDB oracle.
  *
  * Like [[SimHash64]], the signature is a pure function of one
  * document's shingles, so the explode + groupBy(doc_id) the aggregate
  * form required is a shuffle the pipeline doesn't need; this keeps
  * signature computation map-side ahead of the (inherently shuffling)
  * LSH band join. (Empty input yields 2147483647 per lane; in practice
  * every document has ≥1 shingle — WordShingles degrades short docs to
  * one whole-text shingle.)
  */
case class MinHash64(child: Expression)
    extends UnaryExpression with CodegenFallback with RequiresStringArray {

  private val Perms = 64
  private val Mod = 2147483647L

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(Perms)(Mod)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val (h, _) = Md5Hash.hashPair(arr.getUTF8String(i))
      var j = 0
      while (j < Perms) {
        val x = ((2L * j + 1) * h + 1000003L * j + 12345L) % Mod
        if (x < sig(j)) sig(j) = x
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHash64 =
    copy(child = newChild)
}

object MinHash64 {
  def apply(shingles: Column): Column =
    ColumnShim.column(MinHash64(ColumnShim.expression(shingles)))
}

/** (h32, h32b) md5 hash pairs of a shingle array — the 16-byte join keys
  * the pairwise-intersection joins use instead of shuffling full shingle
  * strings. One md5 per shingle feeding both halves (the Column-level
  * h32/h32b pair digests twice).
  */
case class ShingleHashPairs(child: Expression)
    extends UnaryExpression with CodegenFallback with RequiresStringArray {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("h1", LongType, nullable = false),
      StructField("h2", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val (h1, h2) = Md5Hash.hashPair(arr.getUTF8String(i))
      out(i) = InternalRow(h1, h2)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashPairs =
    copy(child = newChild)
}

object ShingleHashPairs {
  def apply(shingles: Column): Column =
    ColumnShim.column(ShingleHashPairs(ColumnShim.expression(shingles)))
}

/** Count of tokens contained in a fixed marker-word set, as one native
  * eval — replaces the interpreted `size(filter(toks, array_contains))`
  * HOF chain that text_stats/text_lang_id ran per language. The word set
  * is baked into the expression (a few stopwords), membership via a
  * java.util.HashSet of UTF8String.
  */
case class MarkerHits(child: Expression, words: Seq[String])
    extends UnaryExpression with CodegenFallback with RequiresStringArray {

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      // null elements don't count — same as the HOF filter() formulation,
      // where array_contains(words, NULL) is NULL and filter drops the row
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  override protected def withNewChildInternal(newChild: Expression): MarkerHits =
    copy(child = newChild)
}

object MarkerHits {
  def apply(tokens: Column, words: Seq[String]): Column =
    ColumnShim.column(MarkerHits(ColumnShim.expression(tokens), words))
}
