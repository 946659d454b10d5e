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
  *
  * Null semantics MATCH the builtin formulation exactly (required for
  * the RewriteVectorDot optimizer rule to be a sound substitution on
  * arbitrary user code): mismatched lengths → NULL (zip_with pads the
  * shorter side with nulls, poisoning the builtin's sum) and any null
  * lane → NULL. Corpus embeddings are dense and fixed-width, so the
  * checks never fire there — they are a per-lane bit test, not a
  * second pass.
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // the expression can produce NULL (ragged/null-lane inputs) even when
  // both children are non-null — force a real isNull slot in codegen
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
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
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Idempotently register the expression on the session's function
    * registry so `call_function`/SQL can resolve it (guarded — see
    * [[Registry.ensure]]). */
  def register(spark: SparkSession): Unit =
    Registry.ensure(spark, "vec_dot")(
      exprs => FloatVectorDot(exprs(0), exprs(1)))

  /** Column-level API: dot product of two float-array columns. */
  def vecDot(spark: SparkSession)(a: Column, b: Column): Column = {
    register(spark)
    call_function("vec_dot", a, b)
  }
}
