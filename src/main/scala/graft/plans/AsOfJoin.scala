package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types.LongType

/** AS-OF JOIN as a first-class operator: logical node → planner strategy →
  * sort-merge physical exec, registered through `SparkSessionExtensions`
  * (`GraftExtensions.injectPlannerStrategy`) — the whole-operator extension
  * path for semantics Spark's built-ins can't express as one operator.
  *
  * Semantics: for every left row, append the LATEST right row of the same
  * key with `right.ts < left.ts` and `left.ts - right.ts <= toleranceSec`
  * (strict, second-granularity longs); ties on right.ts break to the
  * largest `rightTie`. Rows with no match keep the left side and NULL
  * right columns (left-outer as-of). This is the reference's J11
  * "enrich with last stored value, 0/absent if stale" lookup
  * (reference: jobs/clustering/AggregateFeaturesFunction.scala:22-66)
  * as a batch operator; q23 expresses the same thing with an unbounded
  * window sort, this exec does it in ONE forward merge pass.
  *
  * Scale: requiredChildDistribution/Ordering mirror SortMergeJoinExec —
  * EnsureRequirements inserts the hash exchanges and per-partition sorts,
  * AQE coalesces them like any shuffled join; the merge itself is a
  * two-pointer scan holding ONE buffered right row (not a per-key window
  * buffer — compare q23's unbounded-preceding frame). 100 TB cost =
  * one co-partitioned shuffle of each side + linear merge.
  */
final case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
                          leftKey: Attribute, leftTs: Attribute,
                          rightKey: Attribute, rightTs: Attribute,
                          rightTie: Attribute, toleranceSec: Long)
  extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
                                                 newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoin]] into [[AsOfJoinExec]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, lts, rk, rts, rtie, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lts, rk, rts, rtie, tol) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                              leftKey: Attribute, leftTs: Attribute,
                              rightKey: Attribute, rightTs: Attribute,
                              rightTie: Attribute, toleranceSec: Long)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // UI/observability parity with built-in joins: row counts + how many
  // left rows actually found an in-tolerance match
  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched left rows"))

  // SortMergeJoin's contract: both sides clustered on the key —
  // EnsureRequirements inserts compatible hash exchanges, AQE treats it
  // like any shuffled binary node
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending),
      SortOrder(rightTie, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
                                                 newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lkOrd = left.output.indexWhere(_.exprId == leftKey.exprId)
    val ltOrd = left.output.indexWhere(_.exprId == leftTs.exprId)
    val rkOrd = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rtOrd = right.output.indexWhere(_.exprId == rightTs.exprId)
    require(lkOrd >= 0 && ltOrd >= 0 && rkOrd >= 0 && rtOrd >= 0,
      "as-of join attributes must come from the join children")
    val rightWidth = right.output.size
    val tol = toleranceSec
    val outAttrs = output
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nulls = new GenericInternalRow(rightWidth)
      val rBuf = rIter.buffered
      // the single retained candidate: latest right row advanced past
      var candKey = 0L
      var candTs = 0L
      var cand: InternalRow = null

      lIter.map { l =>
        // NULL key/ts can't match anything: SQL comparison semantics, not
        // "reads as epoch 0" (getLong on a null slot returns 0). NULLs sort
        // first under the required Ascending ordering, so skipping them here
        // (left: emit unmatched; right: consume without becoming candidate)
        // keeps the two-pointer merge correct.
        if (l.isNullAt(lkOrd) || l.isNullAt(ltOrd)) {
          numOutputRows += 1
          proj(joined(l, nulls))
        } else {
          val lk = l.getLong(lkOrd)
          val lt = l.getLong(ltOrd)
          // advance right over every row strictly before (lk, lt); the last
          // non-null one advanced is the best candidate (sorted by key, ts,
          // tie)
          var continue = rBuf.hasNext
          while (continue) {
            val h = rBuf.head
            if (h.isNullAt(rkOrd) || h.isNullAt(rtOrd)) {
              rBuf.next() // ineligible row: consume, never a candidate
              continue = rBuf.hasNext
            } else {
              val hk = h.getLong(rkOrd)
              if (hk < lk || (hk == lk && h.getLong(rtOrd) < lt)) {
                val r = rBuf.next()
                candKey = hk
                candTs = r.getLong(rtOrd)
                cand = r.copy() // iterator reuses its row buffer
                continue = rBuf.hasNext
              } else continue = false
            }
          }
          val matched = cand != null && candKey == lk && lt - candTs <= tol
          numOutputRows += 1
          if (matched) numMatched += 1
          proj(joined(l, if (matched) cand else nulls))
        }
      }
    }
  }
}

/** DataFrame-level entry point. */
object AsOfJoinOp {
  /** As-of join `left` with `right`: per left row, the latest right row
    * with the same key and `rightTs < leftTs`, within `toleranceSec`.
    * Key/ts/tie columns must be LongType (callers project
    * `unix_timestamp(...)` seconds — keeping the comparison at second
    * granularity is also the cross-engine parity contract). Column names
    * of the two sides should be disjoint (rename before joining).
    * NULL semantics: a NULL left key/ts row emits with NULL right columns;
    * NULL right key/ts rows never match — SQL comparison semantics, checked
    * per-row in the exec rather than by rejecting nullable inputs. */
  def asof(leftDf: DataFrame, rightDf: DataFrame,
           leftKey: String, leftTs: String,
           rightKey: String, rightTs: String, rightTie: String,
           toleranceSec: Long): DataFrame = {
    val lp = leftDf.queryExecution.analyzed
    val rp = rightDf.queryExecution.analyzed
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    val cols = Seq(attr(lp, leftKey), attr(lp, leftTs),
      attr(rp, rightKey), attr(rp, rightTs), attr(rp, rightTie))
    require(cols.forall(_.dataType == LongType),
      s"as-of key/ts/tie columns must be LongType, got " +
        cols.map(a => s"${a.name}: ${a.dataType.simpleString}").mkString(", "))
    ColumnGlue.dataFrame(leftDf.sparkSession,
      AsOfJoin(lp, rp, cols(0), cols(1), cols(2), cols(3), cols(4), toleranceSec))
  }
}
