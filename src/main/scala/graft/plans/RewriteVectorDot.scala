package graft.plans

import graft.functions.FloatVectorDot
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: recognize the builtin higher-order dot-product
  * pattern
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)),
  *               0.0, (acc, v) -> acc + v) }}}
  *
  * over float arrays and replace it with the codegen'd
  * [[FloatVectorDot]] kernel (~11× — no intermediate array, no lambda
  * interpretation). Semantics are identical: both accumulate
  * left-to-right in double over double-cast float lanes, so results
  * are bit-equal (asserted in the test suite).
  *
  * Injected by `graft.GraftExtensions` (or at runtime via
  * `spark.experimental.extraOptimizations`). This is the pattern from
  * SURVEY §4's stretch slot: user code written against public builtins
  * silently gets the native kernel.
  */
object RewriteVectorDot extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** x, or cast(x as double), referring to lambda variable `v`. */
  private def refOf(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case c: Cast if c.dataType == DoubleType => refOf(c.child, v)
    case x: NamedLambdaVariable => x.exprId == v.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(l, r,
              LambdaFunction(m: Multiply,
                Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(a: Add,
              Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
            LambdaFunction(fin, Seq(accF: NamedLambdaVariable), _))
          if isFloatArray(l) && isFloatArray(r)
            // The Multiply itself must be double-typed: a bare
            // zip_with(a,b,(x,y)->x*y) multiplies in FLOAT (coercion only
            // casts at the Add) and rewriting it would silently replace
            // float-rounded per-lane products with double products.
            && m.dataType == DoubleType
            && ((refOf(m.left, x) && refOf(m.right, y))
              || (refOf(m.left, y) && refOf(m.right, x)))
            && refOf(a.left, acc) && refOf(a.right, v)
            && refOf(fin, accF) =>
        FloatVectorDot(l, r)
    }
}
