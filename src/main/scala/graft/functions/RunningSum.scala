package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, Nondeterministic, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType}

/** PARTITION-LOCAL running sum of a long column — the codegen-clean
  * kernel under [[graft.ops.TwoPass.cumsum]]'s pass 2 (round 14,
  * VERDICT r13 #3). The retired formulation was a whole-Row-encoder
  * `mapPartitions` fold, which planted a
  * DeserializeToObject/SerializeFromObject pair in the middle of every
  * cumsum consumer's pipeline: each row of the (already range-sorted)
  * relation was decoded to an external Row, folded in Scala, and
  * re-encoded — breaking whole-stage codegen across the hottest column
  * of 12 declared keys (KS CDFs, Spearman ranks, calibration/lift/AUC
  * censuses, the concurrency sweep-line, byte-offset sharding). This
  * expression keeps the fold INSIDE the codegen'd pipeline: one mutable
  * long of state, reset per partition, added per row.
  *
  * Semantics and soundness:
  *  - The value for row i is the sum of the child over rows 1..i of the
  *    partition IN EVALUATION ORDER. It is therefore only meaningful
  *    directly above an intra-partition sort — exactly where cumsum
  *    places it ([[graft.ops.TwoPass]] sorts within range partitions
  *    first). Same contract as the mapPartitions fold it replaces.
  *  - Marked nondeterministic (it is: the result depends on row order
  *    and evaluation count), which also FENCES the optimizer — no rule
  *    may push a filter below it, collapse it into another projection
  *    twice, or constant-fold it, the exact hazards a stateful
  *    expression cannot survive.
  *  - `stateful` → fresh copies wherever Catalyst clones plans for
  *    concurrent use; the per-task deserialized tree plus the
  *    per-partition reset in `initializeInternal` keep local-mode
  *    threads from sharing an accumulator.
  *  - NULL child values add nothing (the fold it replaces read
  *    non-null longs only; cumsum's inputs are aggregate outputs that
  *    are never null in practice).
  */
case class RunningLongSum(child: Expression)
    extends UnaryExpression with Nondeterministic with ExpectsInputTypes {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def inputTypes = Seq(LongType)
  override def stateful: Boolean = true
  override def prettyName: String = "running_sum_long"

  @transient private[this] var acc: Long = _

  override protected def initializeInternal(partitionIndex: Int): Unit =
    acc = 0L

  override protected def evalInternal(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v != null) acc += v.asInstanceOf[Long]
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val accTerm = ctx.addMutableState(CodeGenerator.JAVA_LONG, "runningSum")
    ctx.addPartitionInitializationStatement(s"$accTerm = 0L;")
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        if (!${c.isNull}) { $accTerm += ${c.value}; }
        final long ${ev.value} = $accTerm;""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RunningSum {
  /** Arity-checked builder (registration path). */
  def fromExpressions(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 1)
      throw new IllegalArgumentException(
        s"running_sum_long(bigint) takes exactly 1 argument, got ${exprs.length}")
    RunningLongSum(exprs(0))
  }

  /** Idempotently register on the session's function registry. */
  def register(spark: SparkSession): Unit =
    Registry.ensure(spark, "running_sum_long")(fromExpressions)

  /** Column-level API: partition-local running sum of a long column.
    * Only meaningful directly above an intra-partition sort — see the
    * expression contract. */
  def runningSumLong(spark: SparkSession)(c: Column): Column = {
    register(spark)
    call_function("running_sum_long", c)
  }
}
