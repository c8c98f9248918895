package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Fused cosine similarity over two float-vector columns — a native
  * Catalyst expression with whole-stage codegen.
  *
  * Why it exists: the composable formulation
  * (`aggregate(zip_with(...))` for dot and both norms) walks the arrays
  * three times through interpreted higher-order lambdas and allocates an
  * intermediate product array; this kernel runs ONE tight branch-free
  * loop with three scalar accumulators and participates in whole-stage
  * codegen, so it pipelines with the surrounding operators. This is the
  * preference order the engine follows everywhere: built-in functions
  * first, a native `Expression` with `doGenCode` where the built-ins
  * can't express the shape efficiently, UDFs never.
  *
  * Numeric contract: accumulation is double-precision, index order, one
  * accumulator each for dot/|a|²/|b|² — the exact operation sequence of
  * the three separate sequential folds — so results are BIT-IDENTICAL to
  * the composable formulation (and to the DuckDB `list_reduce` oracle):
  * `ann_topk_fused` shares `ann_topk`'s oracle on that basis. Mismatched
  * lengths score over the common prefix; empty/zero vectors yield NaN,
  * matching 0/0 in the composable form.
  *
  * Registered as SQL function `cosine_sim` via
  * [[graft.plans.GraftExtensions]] (`spark.sql.extensions`).
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  // Input typing: both children must be array<float>. The registered SQL
  // builder (GraftExtensions) inserts explicit Casts to array<float>, so
  // any coercible input types are accepted at the SQL surface; the
  // AbstractDataType/ExpectsInputTypes machinery is private[sql] and
  // deliberately not used here.
  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |double $na = 0.0;
         |double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $x = (double) $a.getFloat($i);
         |  final double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y;
         |  $na += $x * $x;
         |  $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
