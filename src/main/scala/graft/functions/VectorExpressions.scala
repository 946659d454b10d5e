package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the hot vector kernel (SURVEY §4's
  * "custom expression codegen for vector math" stretch slot).
  *
  * `zip_with` + `aggregate` computes the same dot product but
  * materializes an intermediate array per row and interprets two
  * lambdas — ~100× slower on the O(n²) dedup pair space. This
  * expression generates a tight scalar loop inside WholeStageCodegen:
  * no allocation, no virtual calls.
  *
  * Numerics: accumulates left-to-right in double over float lanes —
  * bit-identical to the DuckDB oracle's sequential
  * `list_sum(list_transform(...))` pipeline, so hash-matching holds.
  * Null lanes are not expected (corpus embeddings are dense); a null
  * element contributes its Tungsten slot value, matching the builtin
  * behavior for non-null-safe reads.
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  // Locals must be freshName'd: with non-nullable inputs nullSafeCodeGen
  // emits no brace scope, so two occurrences of vec_dot in one codegen
  // scope would redeclare fixed names and janino-fail the whole stage
  // (silently falling back to interpreted execution).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = ctx.freshName("n")
    val acc = ctx.freshName("acc")
    val i = ctx.freshName("i")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Idempotently register the expression on the session's function
    * registry so `call_function`/SQL can resolve it. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => FloatVectorDot(exprs(0), exprs(1)), "scala_udf")

  /** Column-level API: dot product of two float-array columns. */
  def vecDot(spark: SparkSession)(a: Column, b: Column): Column = {
    register(spark)
    call_function("vec_dot", a, b)
  }
}
