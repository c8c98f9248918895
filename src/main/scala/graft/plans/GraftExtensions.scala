package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, FloatType}

import graft.functions.{CosineSimilarity, L2SqDistance}

/** Session extension point for the engine's native Catalyst additions.
  * Activate with `spark.sql.extensions=graft.plans.GraftExtensions`
  * (Verify, Bench and the test base all do).
  *
  * Injects:
  *   - SQL function `cosine_sim(array<float>, array<float>) -> double` —
  *     the fused codegen kernel [[graft.functions.CosineSimilarity]];
  *   - SQL function `l2_sq(array<float>, array<float>) -> double` — the
  *     squared-Euclidean codegen kernel [[graft.functions.L2SqDistance]]
  *     (the PQ codebook metric);
  *   - optimizer rule [[FuseCosine]] — rewrites the declarative
  *     `aggregate(zip_with(...)) / (sqrt(...) * sqrt(...))` cosine into
  *     that kernel automatically (bit-identical by the kernel's numeric
  *     contract), so the naive formulation gets the fast path without the
  *     caller asking.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => FuseCosine)
    ext.injectFunction((
      new FunctionIdentifier("l2_sq"),
      new ExpressionInfo(classOf[L2SqDistance].getName, "l2_sq"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"l2_sq expects 2 arguments, got ${children.length}")
        L2SqDistance(
          Cast(children.head, ArrayType(FloatType)),
          Cast(children(1), ArrayType(FloatType)))
      }))
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"cosine_sim expects 2 arguments, got ${children.length}")
        // explicit coercion to array<float> — the expression's numeric
        // contract is float-input, double-accumulate
        CosineSimilarity(
          Cast(children.head, ArrayType(FloatType)),
          Cast(children(1), ArrayType(FloatType)))
      }))
  }
}
