package graft.plans

import graft.functions.StringArrayOverlap
import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, Expression, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Optimizer rule: `size(array_intersect(a, b))` over string arrays →
  * the allocation-free [[StringArrayOverlap]] kernel. The builtin
  * composition materializes the intersection array per row only to
  * read its length; user code written against public builtins (the
  * natural way to express a set-overlap count) silently gets the
  * kernel — same contract as [[RewriteVectorDot]].
  *
  * Gated on `legacySizeOfNull = false`: under the legacy config
  * `size(NULL)` is -1 while the kernel's NULL-in → NULL-out matches
  * only the modern semantics. */
object RewriteSetOverlap extends Rule[LogicalPlan] {

  private def isStringArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ArrayIntersect(l, r), false)
          if isStringArray(l) && isStringArray(r) =>
        StringArrayOverlap(l, r)
    }
}
