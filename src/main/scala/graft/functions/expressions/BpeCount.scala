package graft.functions.expressions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._

import graft.functions.TextAnalysis

/** Trained-BPE token count of a raw text as ONE native per-row eval:
  * GPT-2-ish pretokenize ([[TextAnalysis.BpePretokenPattern]] — the
  * same java.util.regex pattern `regexp_extract_all` compiles, so
  * pretokens are bit-identical to the batch gate's), then fold every
  * pretoken through the trained merge table
  * ([[TextAnalysis.mergePass]] applied in rank order — the exact
  * algebra of the batch encoder and the DuckDB replay). Returns
  * (n_pretokens, n_bpe_trained).
  *
  * This is the STREAMING-SHAPED form of the trained counter: the batch
  * gate encodes each DISTINCT pretoken once and broadcasts lengths
  * (vocabulary-bounded compute — right for a 100 TB scan); a
  * micro-batch kernel has no distinct/join stage, so the per-row form
  * recomputes per occurrence and amortizes with a per-thread LRU-ish
  * memo over the zipfian vocabulary (bounded, cleared at capacity —
  * NEVER grows with the corpus). Differential-pinned against the batch
  * gate per document in BpeSpec.
  */
case class BpeTrainedCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_trained_count requires a string column, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_pretokens", LongType, nullable = false),
    StructField("n_bpe_trained", LongType, nullable = false)))
  override def nullable: Boolean = child.nullable

  // pattern + memo are per-thread: expression trees can be shared
  // across tasks in interpreted eval (the Md5Hash ThreadLocal rule)
  @transient private lazy val pat = new ThreadLocal[Pattern] {
    override def initialValue(): Pattern =
      Pattern.compile(TextAnalysis.BpePretokenPattern)
  }
  @transient private lazy val memo =
    new ThreadLocal[java.util.HashMap[String, java.lang.Long]] {
      override def initialValue() =
        new java.util.HashMap[String, java.lang.Long](1 << 12)
    }
  private val MemoCap = 1 << 16

  // rank-indexed encode loop (graft.functions.BpeCodec): K-independent
  // per-token cost, so a realistic 2k–50k-merge production table prices
  // the same as the 24-merge gate table; identical output to the
  // rank-order fold by the codec's validated rank-monotone property
  @transient private lazy val codec = graft.functions.BpeCodec(merges)

  private def encodedLen(w: String): Long = {
    val m = memo.get()
    val hit = m.get(w)
    if (hit ne null) hit.longValue
    else {
      val n = codec.encodedLen(w)
      if (m.size >= MemoCap) m.clear()
      m.put(w, n)
      n
    }
  }

  override def nullSafeEval(v: Any): Any = {
    val matcher = pat.get().matcher(v.toString)
    var nPre = 0L
    var total = 0L
    while (matcher.find()) {
      nPre += 1L
      total += encodedLen(matcher.group())
    }
    InternalRow(nPre, total)
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTrainedCount =
    copy(child = newChild)
}

object BpeTrainedCount {
  def apply(text: Column, merges: Seq[(String, String)]): Column =
    ColumnShim.column(BpeTrainedCount(ColumnShim.expression(text), merges))
}

/** Trained-BPE token count of ONE pretoken (no pretokenization) — the
  * scalable batch encode kernel: `bpeTrainedPerDoc` evaluates it once
  * per DISTINCT pretoken and broadcasts the lengths back onto the
  * corpus stream, so the per-token cost is the [[graft.functions.BpeCodec]]
  * lowest-rank loop (merge-count-independent) instead of one nested
  * HOF fold column per merge (which capped the old path at gate-scale
  * merge tables — VERDICT r15 residual 1). Differential-pinned against
  * the HOF fold and the driver fold in BpeDeepSpec. */
case class BpeEncodedLen(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encoded_len requires a string column, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  @transient private lazy val codec = graft.functions.BpeCodec(merges)

  override def nullSafeEval(v: Any): Any = codec.encodedLen(v.toString)

  override protected def withNewChildInternal(newChild: Expression): BpeEncodedLen =
    copy(child = newChild)
}

object BpeEncodedLen {
  def apply(token: Column, merges: Seq[(String, String)]): Column =
    ColumnShim.column(BpeEncodedLen(ColumnShim.expression(token), merges))
}
