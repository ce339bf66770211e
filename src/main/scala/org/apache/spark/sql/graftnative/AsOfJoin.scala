package org.apache.spark.sql.graftnative

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, classic}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Whole-operator extension path: a true AS-OF JOIN as a first-class plan
  * node — custom `LogicalPlan` + `SparkStrategy` + `SparkPlan` — instead of
  * the conditional-join + window-argmax composition (`RelationalOps.joinAsof`).
  *
  * Semantics (backward as-of): for each left row, the single right row
  * with the same key and the greatest `rightTs <= leftTs`, ties on
  * `rightTs` broken by the greatest `rightTie`. NULL keys/timestamps
  * never match (SQL equality). Inner (default) drops unmatched left
  * rows; `isOuter` keeps them with a null right side (pandas
  * merge_asof's default shape), surfacing the right columns nullable.
  *
  * Why a physical operator: the composed form joins EVERY (left, right)
  * pair that satisfies `ts <= ts` — a user with p purchases and s signups
  * materializes p×s intermediate rows before the window discards all but p.
  * This node is a co-partitioned merge: both sides hash-cluster on the key
  * and sort by (key, ts), then one forward pass per partition keeps O(1)
  * state (the current best match) and emits exactly one row per matched
  * left row. At 100 TB that is the difference between a join whose output
  * is quadratic in per-key activity and a linear merge — the same reason
  * kdb/Flink/QuestDB ship as-of as a primitive rather than a rewrite.
  *
  * Catalyst integration is the textbook extension recipe on public hooks:
  * the strategy is injected via `SparkSessionExtensions.injectPlannerStrategy`
  * (GraftExtensions) and, for sessions built without the extension, via
  * `spark.experimental.extraStrategies`. EnsureRequirements satisfies the
  * declared distribution/ordering, so AQE still plans and COALESCES the
  * exchanges — the operator only states WHAT it needs. One honest limit:
  * AQE's OptimizeSkewedJoin rewrites only SortMergeJoin/ShuffledHashJoin,
  * never custom nodes, so an extreme hot key falls back to the manual
  * salting pattern (ScaleOps.saltedJoin) like any non-SMJ operator.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTs: Attribute,
    rightTs: Attribute,
    rightTie: Attribute,
    isOuter: Boolean = false) extends BinaryNode {

  // left-outer keeps unmatched left rows with a null right side, so the
  // right attributes must surface as nullable regardless of the child's
  // schema (a non-null parquet column is still null on a miss).
  override def output: Seq[Attribute] =
    left.output ++ (if (isOuter) right.output.map(_.withNullability(true)) else right.output)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts, tie, outer) =>
      AsOfJoinExec(lk, rk, lts, rts, tie, outer, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKey: Attribute,
    rightKey: Attribute,
    leftTs: Attribute,
    rightTs: Attribute,
    rightTie: Attribute,
    isOuter: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  require(leftKey.dataType == rightKey.dataType,
    s"as-of join key types differ: ${leftKey.dataType} vs ${rightKey.dataType}")
  require(leftTs.dataType == rightTs.dataType,
    s"as-of join timestamp types differ: ${leftTs.dataType} vs ${rightTs.dataType}")

  override def output: Seq[Attribute] =
    left.output ++ (if (isOuter) right.output.map(_.withNullability(true)) else right.output)

  // Hash-cluster both sides on the join key; EnsureRequirements inserts
  // compatible exchanges (or reuses existing co-partitioning, e.g. a
  // bucketed layout) exactly as it does for SortMergeJoin.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey), requireAllClusterKeys = false, requiredNumPartitions = None) ::
    ClusteredDistribution(Seq(rightKey), requireAllClusterKeys = false, requiredNumPartitions = None) :: Nil

  // Sorted by (key, ts [, tie]) ascending — the merge's "best so far" is
  // then simply the LAST right row whose ts <= the left ts.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending), SortOrder(rightTie, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  // UI/observability parity with built-in joins: without metrics a custom
  // node renders as a blank box in the SQL tab.
  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatchedRows" -> SQLMetrics.createMetric(sparkContext, "number of matched left rows"))

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatchedRows = longMetric("numMatchedRows")
    val lOut = left.output
    val rOut = right.output
    val lk = leftKey; val rk = rightKey
    val lts = leftTs; val rts = rightTs
    val outer = isOuter
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // Executor-side projections: one instance per use site because
      // UnsafeProjection reuses its result buffer across calls.
      val lKeyProj = UnsafeProjection.create(Seq(lk), lOut)
      val rKeyProj = UnsafeProjection.create(Seq(rk), rOut)
      val mKeyProj = UnsafeProjection.create(Seq(rk), rOut) // for the buffered match
      val lTsProj = UnsafeProjection.create(Seq(lts), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rts), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lk.dataType))
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lts.dataType))
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nullRight = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(rOut.size)

      new Iterator[InternalRow] {
        // Lookahead right row — copied because the child iterator reuses
        // its row buffer. `matched` is the best-so-far right row for the
        // key currently being merged (O(1) state per partition).
        private var rNext: UnsafeRow =
          if (rIter.hasNext) rIter.next().asInstanceOf[UnsafeRow].copy() else null
        private var matched: UnsafeRow = null
        private var nextOut: InternalRow = null

        private def advanceRight(): Unit = {
          if (rIter.hasNext) rNext = rIter.next().asInstanceOf[UnsafeRow].copy()
          else rNext = null
        }

        private def computeNext(): Unit = {
          nextOut = null
          while (nextOut == null && lIter.hasNext) {
            val lRow = lIter.next()
            val lKeyRow = lKeyProj(lRow)
            val lTsRow = lTsProj(lRow)
            val lNull = lKeyRow.isNullAt(0) || lTsRow.isNullAt(0)
            if (!lNull) {
              // Consume right rows that are behind (smaller key) or are
              // candidates (same key, ts <= left ts). Rows consumed here
              // are never needed again: left (key, ts) only increases.
              var continue = rNext != null
              while (continue) {
                val rKeyRow = rKeyProj(rNext)
                val c = if (rKeyRow.isNullAt(0)) -1 else keyOrd.compare(rKeyRow, lKeyRow)
                if (c < 0) { advanceRight(); continue = rNext != null }
                else if (c == 0) {
                  val rTsRow = rTsProj(rNext)
                  if (rTsRow.isNullAt(0)) {
                    // NULL ts sorts first in the group and can never match
                    // any left row — discard, don't block the merge.
                    advanceRight(); continue = rNext != null
                  } else if (tsOrd.compare(rTsRow, lTsRow) <= 0) {
                    matched = rNext // ts/tie ascending: later candidate wins
                    advanceRight(); continue = rNext != null
                  } else continue = false
                } else continue = false
              }
              if (matched != null && keyOrd.compare(mKeyProj(matched), lKeyRow) == 0) {
                nextOut = resultProj(joined(lRow, matched))
                numMatchedRows += 1
              } else if (outer) {
                nextOut = resultProj(joined(lRow, nullRight))
              }
            } else if (outer) {
              // NULL key/ts never matches, but left-outer still keeps the row
              nextOut = resultProj(joined(lRow, nullRight))
            }
            if (nextOut != null) numOutputRows += 1
          }
        }

        override def hasNext: Boolean = {
          if (nextOut == null) computeNext()
          nextOut != null
        }

        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("empty as-of merge iterator")
          val out = nextOut
          nextOut = null
          out
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level entry point (column names; attributes resolved from the
  * analyzed children). Registers the planner strategy idempotently for
  * sessions not built with GraftExtensions. */
object AsOfJoinApi {
  def asofJoin(leftDf: DataFrame, rightDf: DataFrame,
               leftKey: String, rightKey: String,
               leftTs: String, rightTs: String,
               rightTie: String,
               isOuter: Boolean = false): DataFrame = {
    val spark = leftDf.sparkSession.asInstanceOf[classic.SparkSession]
    // Register only when the session doesn't already plan AsOfJoinPlan:
    // GraftExtensions-built sessions carry the strategy via
    // injectPlannerStrategy (visible in the planner's strategy list), and
    // touching experimental.extraStrategies for them would silently
    // mutate session planning state the user already configured. For
    // bare sessions, the read-check-append is guarded by a session-scoped
    // lock so concurrent first calls can't double-register.
    val planned = spark.sessionState.planner.strategies.contains(AsOfJoinStrategy)
    if (!planned) spark.experimental.synchronized {
      if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ AsOfJoinStrategy
      }
    }
    val l = leftDf.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed
    val r0 = rightDf.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed
    // Self-join safety: if the two sides share attribute ids (same base
    // relation), re-alias the right side so the combined output is unique.
    val r = if (r0.outputSet.intersect(l.outputSet).isEmpty) r0
            else Project(r0.output.map(a => Alias(a, a.name)()), r0)
    def attr(p: LogicalPlan, n: String, side: String): Attribute =
      p.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"asofJoin: no column '$n' on the $side side (has ${p.output.map(_.name).mkString(", ")})"))
    classic.Dataset.ofRows(spark, AsOfJoinPlan(l, r,
      attr(l, leftKey, "left"), attr(r, rightKey, "right"),
      attr(l, leftTs, "left"), attr(r, rightTs, "right"), attr(r, rightTie, "right"),
      isOuter))
  }
}
