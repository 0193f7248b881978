package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.classic.Strategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder,
  UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.LongType

/** Native as-of join through the full Catalyst stack (SURVEY §7 preference
  * (c): custom LogicalPlan + Strategy + SparkPlan) — the whole-operator
  * form of what q19 composes from window functions.
  *
  * Semantics: for each left row, the matching right row of the same key
  * is the greatest right-time strictly BEFORE the left time
  * ([[Backward]], DuckDB `l.t > r.t`) or the smallest strictly AFTER it
  * ([[Forward]], DuckDB `l.t < r.t`), optionally constrained to lie
  * within a tolerance of the left time (`within` µs, pandas
  * `merge_asof(..., tolerance=...)`). [[Inner]] drops left rows with no
  * match; [[LeftOuter]] keeps them with a null-filled right side
  * (DuckDB `ASOF LEFT JOIN` / merge_asof's default).
  *
  * Scale shape: the exec declares `ClusteredDistribution(key)` and
  * per-partition `(key, time)` ordering as REQUIREMENTS and lets
  * EnsureRequirements plan the exchanges/sorts — one hash shuffle per
  * side, then a streaming per-partition merge with O(1) state (the
  * current candidate row), never materializing a window buffer. That is
  * exactly the plan a 1000-executor as-of over 100 TB wants, and the
  * requirements compose with AQE like any built-in join.
  */
object AsOfJoin {

  /** Match direction: Backward = greatest right time strictly BEFORE the
    * left time (DuckDB `l.t > r.t`); Forward = smallest right time
    * strictly AFTER it (DuckDB `l.t < r.t`). */
  sealed trait Direction
  case object Backward extends Direction
  case object Forward extends Direction

  /** Join kind: [[Inner]] drops unmatched left rows; [[LeftOuter]]
    * keeps them with a null-filled right side (the merge_asof/DuckDB
    * `ASOF LEFT JOIN` default shape). */
  sealed trait JoinKind
  case object Inner extends JoinKind
  case object LeftOuter extends JoinKind

  private def outputFor(
      left: Seq[Attribute], right: Seq[Attribute], kind: JoinKind): Seq[Attribute] =
    left ++ (kind match {
      case LeftOuter => right.map(_.withNullability(true))
      case Inner => right
    })

  /** Logical node. `leftTime`/`rightTime` must be LongType (epoch micros
    * convention used across graft); keys are one or more expressions per
    * side, pairwise type-matched and orderable — they equi-compare like
    * DuckDB `ASOF JOIN ... ON k1 = k1' AND k2 = k2' AND t > t'`.
    * `within` is an optional tolerance in the time unit: a candidate
    * only matches when |leftTime − rightTime| ≤ within. */
  case class AsOfJoinPlan(
      left: LogicalPlan,
      right: LogicalPlan,
      leftKeys: Seq[Expression],
      rightKeys: Seq[Expression],
      leftTime: Expression,
      rightTime: Expression,
      direction: Direction = Backward,
      joinType: JoinKind = Inner,
      within: Option[Long] = None)
      extends BinaryNode {
    override def output: Seq[Attribute] = outputFor(left.output, right.output, joinType)
    override lazy val resolved: Boolean =
      childrenResolved &&
        (leftKeys ++ rightKeys ++ Seq(leftTime, rightTime)).forall(_.resolved)
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
      copy(left = newLeft, right = newRight)
  }

  /** Physical merge as-of join. Children arrive hash-clustered by key and
    * sorted by (key, time) — guaranteed by the declared requirements. */
  case class AsOfJoinExec(
      leftKeys: Seq[Expression],
      rightKeys: Seq[Expression],
      leftTime: Expression,
      rightTime: Expression,
      direction: Direction,
      joinType: JoinKind,
      within: Option[Long],
      left: SparkPlan,
      right: SparkPlan)
      extends BinaryExecNode {

    override def output: Seq[Attribute] = outputFor(left.output, right.output, joinType)

    override lazy val metrics = Map(
      "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
        .createMetric(sparkContext, "number of output rows"))

    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
      rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

    override def outputPartitioning: Partitioning = left.outputPartitioning

    override def outputOrdering: Seq[SortOrder] =
      leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending)

    override protected def doExecute(): RDD[InternalRow] = {
      val outputAttrs = output
      val leftOut = left.output
      val rightOut = right.output
      val lKeys = leftKeys
      val rKeys = rightKeys
      val lTime = leftTime
      val rTime = rightTime
      val keySchema = org.apache.spark.sql.types.StructType(lKeys.zipWithIndex.map {
        case (e, i) => org.apache.spark.sql.types.StructField(s"k$i", e.dataType, e.nullable)
      })
      val dir = direction
      val outer = joinType == LeftOuter
      val noTol = within.isEmpty
      val tol = within.getOrElse(Long.MaxValue)
      val numOutputRows = longMetric("numOutputRows")
      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        val rBuf = rIter.buffered
        val joined = new JoinedRow
        // codegen'd key/time → UnsafeRow projections: primitive reads on
        // the merge hot path instead of per-row boxed Expression.eval
        // (VERDICT r2 item 7); keys compare through a codegen'd ordering
        // over the projected key rows, so any orderable key types work
        val lKeyProj = UnsafeProjection.create(lKeys, leftOut)
        val rKeyProj = UnsafeProjection.create(rKeys, rightOut)
        val lTimeProj = UnsafeProjection.create(Seq(lTime), leftOut)
        val rTimeProj = UnsafeProjection.create(Seq(rTime), rightOut)
        val keyOrd = org.apache.spark.sql.catalyst.expressions.codegen
          .GenerateOrdering.create(keySchema)
        val project = UnsafeProjection.create(outputAttrs, outputAttrs)
        // all-null right side for unmatched LEFT OUTER rows
        val nullRight: InternalRow = new GenericInternalRow(rightOut.size)
        def unmatched(lRow: InternalRow): Iterator[InternalRow] =
          if (outer) { numOutputRows += 1; Iterator.single(project(joined(lRow, nullRight))) }
          else Iterator.empty
        def matched(lRow: InternalRow, rRow: InternalRow): Iterator[InternalRow] = {
          numOutputRows += 1
          Iterator.single(project(joined(lRow, rRow)))
        }
        // tolerance check, overflow-safe: the match rule guarantees the
        // candidate is STRICTLY on the correct side, so the true delta
        // lies in (0, 2^64) and the wrapped 64-bit difference equals it
        // as an UNSIGNED value — a signed `delta <= tol` admits a bogus
        // match when a sentinel time (e.g. Long.MinValue) overflows the
        // subtraction to negative
        def withinTol(later: Long, earlier: Long): Boolean =
          noTol || java.lang.Long.compareUnsigned(later - earlier, tol) <= 0
        dir match {
          case Backward =>
            // O(1) merge state: the latest right row whose (key, time)
            // has been passed by the left cursor — the as-of candidate
            var candKey: InternalRow = null // copied key row
            var candTime = 0L
            var hasCand = false
            var cand: InternalRow = null
            lIter.flatMap { lRow =>
              val lKeyRow = lKeyProj(lRow)
              val lTimeRow = lTimeProj(lRow)
              // LEFT OUTER keeps left rows with a NULL key slot or time
              // (they can never match, like DuckDB ASOF LEFT JOIN).
              // Emitting them WITHOUT touching the right cursor is
              // sound regardless of where nulls sort — skipping a left
              // row never invalidates the candidate state or the
              // cursor position for later left rows. Inner never sees
              // them — asof() pre-filters that case.
              if (lKeyRow.anyNull || lTimeRow.isNullAt(0)) unmatched(lRow)
              else {
                val lt = lTimeRow.getLong(0)
                var advancing = true
                while (advancing && rBuf.hasNext) {
                  val head = rBuf.head
                  val rKeyRow = rKeyProj(head) // one projection per right row
                  val cmp = keyOrd.compare(rKeyRow, lKeyRow)
                  if (cmp < 0) { rBuf.next(); () }
                  else if (cmp == 0) {
                    // time projected only on key match — skipped rows
                    // of other keys never pay it
                    val rt = rTimeProj(head).getLong(0)
                    if (rt < lt) {
                      val consumed = rBuf.next()
                      cand = consumed.copy(); candKey = rKeyRow.copy()
                      candTime = rt; hasCand = true
                    } else advancing = false
                  } else advancing = false
                }
                if (hasCand && keyOrd.compare(candKey, lKeyRow) == 0 &&
                    withinTol(lt, candTime)) matched(lRow, cand)
                else unmatched(lRow)
              }
            }
          case Forward =>
            // forward match is the PEEK, not trailing state: discard
            // rights at or before the left time, then the head (if the
            // same key) is the smallest strictly-later right — and may
            // serve several left rows, so it is never consumed on match
            lIter.flatMap { lRow =>
              val lKeyRow = lKeyProj(lRow)
              val lTimeRow = lTimeProj(lRow)
              if (lKeyRow.anyNull || lTimeRow.isNullAt(0)) unmatched(lRow)
              else {
                val lt = lTimeRow.getLong(0)
                // advance and decide in ONE pass: the loop exits with
                // the head's key-compare and time already evaluated, so
                // no re-projection after the advance (and skipped rows
                // of other keys never project their time at all)
                var out: Iterator[InternalRow] = null
                while (out == null && rBuf.hasNext) {
                  val head = rBuf.head
                  val cmp = keyOrd.compare(rKeyProj(head), lKeyRow)
                  if (cmp < 0) { rBuf.next(); () }
                  else if (cmp == 0) {
                    val rt = rTimeProj(head).getLong(0)
                    if (rt <= lt) { rBuf.next(); () }
                    else out = if (withinTol(rt, lt)) matched(lRow, head)
                               else unmatched(lRow)
                  } else out = unmatched(lRow)
                }
                if (out == null) unmatched(lRow) else out
              }
            }
        }
      }
    }

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
      copy(left = newLeft, right = newRight)
  }

  /** Planner strategy mapping the logical node to the exec. Injected by
    * [[GraftExtensions]]; [[asof]] also self-registers it via
    * `experimental.extraStrategies` so the operator works in any session. */
  object AsOfJoinStrategy extends Strategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsOfJoinPlan(l, r, lks, rks, lt, rt, dir, kind, tol) =>
        AsOfJoinExec(lks, rks, lt, rt, dir, kind, tol, planLater(l), planLater(r)) :: Nil
      case _ => Nil
    }
  }

  /** Optimizer rule: push filter conjuncts that reference only LEFT
    * columns below the as-of join, so they reach the left scan
    * (Catalyst's own PushPredicateThroughJoin doesn't know this node).
    * Sound for BOTH join kinds because each output row corresponds to
    * exactly one left row — dropping left rows early never affects other
    * rows' matches (the left side is the preserved side). RIGHT-side
    * conjuncts must NOT push: removing right rows can promote an older
    * row to as-of candidate and change results, the same reason filters
    * don't push below the null-supplying side of an outer join. */
  object PushFilterThroughAsOfJoin
      extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
      with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
    import org.apache.spark.sql.catalyst.expressions.And
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
      case f @ Filter(cond, aj: AsOfJoinPlan) =>
        val (push, keep) = splitConjunctivePredicates(cond)
          .partition(p => p.deterministic && p.references.subsetOf(aj.left.outputSet))
        if (push.isEmpty) f
        else {
          val pushed = aj.copy(left = Filter(push.reduce(And), aj.left))
          keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
        }
    }
  }

  /** Optimizer rule: column pruning through the as-of join. Catalyst's
    * ColumnPruning doesn't know this node, so without the rule a
    * `asof(fatLeft, fatRight, ...).select(two columns)` would shuffle
    * every column of both sides. Projects each child down to the columns
    * the parent Project references plus the join's own key/time
    * attributes; fires only when it strictly shrinks a side. */
  object PruneAsOfJoinColumns
      extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
    import org.apache.spark.sql.catalyst.expressions.AttributeSet
    import org.apache.spark.sql.catalyst.plans.logical.Project
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
      case p @ Project(projectList, aj: AsOfJoinPlan) =>
        val needed = AttributeSet(projectList.flatMap(_.references)) ++
          AttributeSet((aj.leftKeys ++ aj.rightKeys ++ Seq(aj.leftTime, aj.rightTime))
            .flatMap(_.references))
        val newLeft = aj.left.output.filter(needed.contains)
        val newRight = aj.right.output.filter(needed.contains)
        if (newLeft.size == aj.left.output.size && newRight.size == aj.right.output.size) p
        else p.copy(child = aj.copy(
          left = if (newLeft.size == aj.left.output.size) aj.left else Project(newLeft, aj.left),
          right = if (newRight.size == aj.right.output.size) aj.right else Project(newRight, aj.right)))
    }
  }

  /** Convenience self-registration via `experimental.extraStrategies`.
    * NOTE (ADVICE r2): the PRIMARY registration mechanism is
    * [[GraftExtensions]] through `spark.sql.extensions` — rules injected
    * there run inside the main optimizer batches and compose with
    * datasource pushdown (pushed filters/projects reach the scan).
    * Rules added here land in the post-optimizer "User Provided
    * Optimizers" batch: still correct, but filters pushed below the
    * as-of node after the main batches won't further fold into
    * `PushedFilters` of a parquet scan. Synchronized on the session:
    * check-then-append on the shared mutable lists was racy under
    * concurrent first use. */
  private def ensureStrategy(s: SparkSession): Unit = s.synchronized {
    if (!s.experimental.extraStrategies.contains(AsOfJoinStrategy))
      s.experimental.extraStrategies = s.experimental.extraStrategies :+ AsOfJoinStrategy
    Seq(PushFilterThroughAsOfJoin, PruneAsOfJoinColumns).foreach { r =>
      if (!s.experimental.extraOptimizations.contains(r))
        s.experimental.extraOptimizations = s.experimental.extraOptimizations :+ r
    }
  }

  /** Public API: `AsOfJoin.asof(purchases, clicks, "user_id", "us")` —
    * for each left row, append the matching right row (same key,
    * greatest right time strictly before the left time — or strictly
    * after with [[Forward]]). `joinType = LeftOuter` keeps unmatched
    * left rows with a null-filled right side; `within = Some(µs)`
    * bounds the match to a tolerance of the left time. Time columns
    * must be LongType; column names must not collide across sides. */
  def asof(
      left: DataFrame, right: DataFrame,
      leftKeyCol: String, rightKeyCol: String,
      leftTimeCol: String, rightTimeCol: String,
      direction: Direction = Backward,
      joinType: JoinKind = Inner,
      within: Option[Long] = None): DataFrame =
    asofMulti(left, right, Seq(leftKeyCol), Seq(rightKeyCol),
      leftTimeCol, rightTimeCol, direction, joinType, within)

  /** Multi-key as-of: equality on one or more key columns per side
    * (pairwise type-matched, any orderable type — the DuckDB
    * `ASOF JOIN ... ON k1 = k1' AND k2 = k2' AND t > t'` shape), then
    * the as-of match on the LongType time columns. Same plan shape as
    * the single-key form: the keys hash-cluster both sides together
    * and prefix the per-partition sort. */
  def asofMulti(
      left: DataFrame, right: DataFrame,
      leftKeyCols: Seq[String], rightKeyCols: Seq[String],
      leftTimeCol: String, rightTimeCol: String,
      direction: Direction = Backward,
      joinType: JoinKind = Inner,
      within: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions.col
    require(within.forall(_ >= 0L), "as-of tolerance must be non-negative")
    require(leftKeyCols.nonEmpty && leftKeyCols.size == rightKeyCols.size,
      "as-of needs at least one key column and the same count on both sides")
    val spark = left.sparkSession
    ensureStrategy(spark)
    // NULL keys/times never match in as-of semantics. The RIGHT side
    // always filters them (a null candidate is meaningless, and the
    // merge reads projected primitives — an unboxed null would
    // fabricate matches and break the sorted-merge invariant).
    // The LEFT side filters only under Inner: LEFT OUTER preserves
    // null-key/time left rows with a null-filled right side (DuckDB
    // ASOF LEFT JOIN behavior) — the exec checks null slots before
    // reading the primitives and emits them unmatched.
    val lFiltered =
      if (joinType == Inner)
        left.filter((leftKeyCols :+ leftTimeCol).map(col(_).isNotNull).reduce(_ && _))
      else left
    val lPlan = ColumnShim.logicalPlan(lFiltered)
    val rPlan = ColumnShim.logicalPlan(
      right.filter((rightKeyCols :+ rightTimeCol).map(col(_).isNotNull).reduce(_ && _)))
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in ${p.output.map(_.name).mkString(", ")}"))
    val lks = leftKeyCols.map(attr(lPlan, _))
    val rks = rightKeyCols.map(attr(rPlan, _))
    val (lt, rt) = (attr(lPlan, leftTimeCol), attr(rPlan, rightTimeCol))
    require(lt.dataType == LongType && rt.dataType == LongType,
      "as-of time columns must be LongType (epoch micros convention)")
    lks.zip(rks).foreach { case (a, b) =>
      require(a.dataType == b.dataType,
        s"as-of key type mismatch: ${a.name}: ${a.dataType.simpleString} vs ${b.name}: ${b.dataType.simpleString}")
      require(org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(a.dataType),
        s"as-of key ${a.name} has unorderable type ${a.dataType.simpleString}")
    }
    val overlap = lPlan.output.map(_.name).toSet intersect rPlan.output.map(_.name).toSet
    require(overlap.isEmpty,
      s"as-of output keeps both sides' columns; rename the overlapping ones first: ${overlap.mkString(", ")}")
    ColumnShim.ofRows(spark,
      AsOfJoinPlan(lPlan, rPlan, lks, rks, lt, rt, direction, joinType, within))
  }
}
