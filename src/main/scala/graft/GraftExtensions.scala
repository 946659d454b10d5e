package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.FloatVectorDot

/** Session-extension entry point: makes the engine's native functions
  * available to any session built with
  * `.withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.GraftExtensions`) — the idiomatic way to
  * ship custom Catalyst expressions with a library. Per-session
  * registration for already-running sessions goes through
  * `graft.functions.VectorExpressions.register`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVectorDot].getName, "vec_dot"),
      exprs => FloatVectorDot(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("minhash_agg"),
      new ExpressionInfo(classOf[functions.MinHashAgg].getName, "minhash_agg"),
      exprs => functions.MinHashAgg(exprs.head).toAggregateExpression()))
    e.injectFunction((
      FunctionIdentifier("simhash_agg"),
      new ExpressionInfo(classOf[functions.SimHashAgg].getName, "simhash_agg"),
      exprs => functions.SimHashAgg(exprs.head).toAggregateExpression()))
    e.injectFunction((
      FunctionIdentifier("topk_agg"),
      new ExpressionInfo(classOf[functions.TopKAgg].getName, "topk_agg"),
      exprs => functions.TopKAgg.fromExpressions(exprs)))
    e.injectFunction((
      FunctionIdentifier("freq_agg"),
      new ExpressionInfo(classOf[functions.FreqAgg].getName, "freq_agg"),
      exprs => functions.FreqAgg.fromExpressions(exprs)))
    e.injectFunction((
      FunctionIdentifier("array_overlap_count"),
      new ExpressionInfo(classOf[functions.StringArrayOverlap].getName,
        "array_overlap_count"),
      exprs => functions.SetExpressions.fromExpressions(exprs)))
    // builtin zip_with/aggregate dot products → the native kernel
    e.injectOptimizerRule(_ => graft.plans.RewriteVectorDot)
    // builtin size(array_intersect(…)) overlap counts → the kernel
    e.injectOptimizerRule(_ => graft.plans.RewriteSetOverlap)
    // whole-operator extension: native as-of join planning
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
