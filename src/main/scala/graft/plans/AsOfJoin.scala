package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlShim, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder,
  UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Whole-operator Catalyst extension: a native AS-OF join — for every
  * left row, attach the LAST right row of the same key whose time is
  * at-or-before the left row's time (left-outer: no match ⇒ nulls).
  *
  * Spark has no ASOF join operator; the composable formulations are a
  * union+window (one shuffle of the union, used by `q_join_asof`) or
  * a range join + `row_number` (pair blowup before the rank). This
  * node is the third rung of the extension ladder — custom
  * LogicalPlan + SparkStrategy + SparkPlan — and plans exactly like a
  * sort-merge join: `requiredChildDistribution` co-clusters both
  * sides on the key (EnsureRequirements inserts compatible hash
  * exchanges), `requiredChildOrdering` demands the (key, time)
  * external sort, and execution is ONE forward merge scan per
  * partition with O(1) state — no pair space, no window buffer,
  * spill-safe sorts, works under AQE (the exchanges are
  * ENSURE_REQUIREMENTS-origin, coalesced consistently like any
  * join's).
  *
  * Time ties on the right resolve to the last row in (key, time)
  * sort order; callers whose payload depends on tie identity should
  * include a tiebreaker in `rightTime`'s column (the declared query
  * surfaces only the matched TIME, which is tie-invariant).
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    tolerance: Option[Long] = None)
    extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: AsOfJoin logical node → AsOfJoinExec. Injected via
  * GraftExtensions (injectPlannerStrategy) or
  * `spark.experimental.extraStrategies`. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoin =>
      AsOfJoinExec(j.leftKey, j.rightKey, j.leftTime, j.rightTime,
        j.tolerance, planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    tolerance: Option[Long],
    left: SparkPlan,
    right: SparkPlan)
    extends BinaryExecNode {

  // key must be long-backed; time must be long-backed (bigint or
  // timestamp — timestamps are physically long micros), so the merge
  // scan compares raw longs
  require(leftKey.dataType == LongType && rightKey.dataType == LongType,
    s"as-of keys must be bigint, got ${leftKey.dataType}/${rightKey.dataType}")
  require(Seq(leftTime, rightTime).forall(t =>
    t.dataType == LongType || t.dataType == TimestampType),
    s"as-of times must be bigint/timestamp, got " +
      s"${leftTime.dataType}/${rightTime.dataType}")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)) ::
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) :: Nil

  override def outputPartitioning: Partitioning = left.outputPartitioning

  // left rows stream through in their sorted order
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKey = leftKey
    val rKey = rightKey
    val lTime = leftTime
    val rTime = rightTime
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lProj = UnsafeProjection.create(Seq(lKey, lTime), lOut)
      val rProj = UnsafeProjection.create(Seq(rKey, rTime), rOut)
      // downstream operators expect UnsafeRow-compatible output; bind
      // against the NULLABLE output attrs (binding against the raw
      // right schema would mark its fields non-nullable and read
      // garbage instead of null on unmatched rows)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.length)
      val rBuf = rIter.buffered
      // O(1) merge state: the last right row consumed, valid for
      // heldKey (rows are copied out of the iterator's reused buffer)
      var held: UnsafeRow = null
      var heldKey = 0L
      var heldTime = 0L
      val tol = tolerance.getOrElse(Long.MaxValue)

      lIter.map { lRow =>
        val lkt = lProj(lRow)
        if (lkt.isNullAt(0) || lkt.isNullAt(1)) {
          resultProj(joined(lRow, nullRight)) // null never matches
        } else {
          val lk = lkt.getLong(0)
          val lt = lkt.getLong(1)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rkt = rProj(rBuf.head)
            if (rkt.isNullAt(0) || rkt.isNullAt(1)) {
              rBuf.next() // unmatched by any key
            } else {
              val rk = rkt.getLong(0)
              if (rk < lk) {
                rBuf.next() // behind the current key: discard
              } else if (rk == lk && rkt.getLong(1) <= lt) {
                heldTime = rkt.getLong(1)
                held = rBuf.next().asInstanceOf[UnsafeRow].copy()
                heldKey = rk
              } else {
                advancing = false // ahead of this left row: stop
              }
            }
          }
          // the held row is the LATEST at-or-before candidate; if even
          // it falls outside the lookback tolerance, nothing matches
          if (held != null && heldKey == lk && lt - heldTime <= tol) {
            resultProj(joined(lRow, held))
          } else resultProj(joined(lRow, nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level API over the native node. */
object AsOf {

  /** Idempotently make the strategy available on a running session. */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }

  /** `left` as-of-joined with `right`: every left row plus the columns
    * of the last right row with `right(rightKey) = left(leftKey)` and
    * `right(rightTime) <= left(leftTime)` (nulls when none). An
    * optional `tolerance` bounds the lookback:
    * `leftTime - rightTime <= tolerance` (in the time column's units —
    * micros for timestamps). Column names must exist on their
    * respective sides; disambiguate by renaming before the call. */
  def join(left: DataFrame, right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String,
      tolerance: Option[Long] = None): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    def attr(df: DataFrame, name: String) =
      df.queryExecution.analyzed.output.find(_.name == name).getOrElse(
        sys.error(s"as-of column $name not found"))
    GraftSqlShim.ofRows(spark, AsOfJoin(
      left.queryExecution.analyzed, right.queryExecution.analyzed,
      attr(left, leftKey), attr(right, rightKey),
      attr(left, leftTime), attr(right, rightTime), tolerance))
  }
}
