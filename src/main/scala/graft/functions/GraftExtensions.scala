package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Expression, ExpressionInfo, LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Catalyst optimizer rule: rewrite the composable HOF dot product
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0d, (acc, x) -> acc + x)
  * into the fused codegen [[DotProduct]] expression. Conservative match:
  * both lambdas must be pure variable arithmetic and the finish lambda the
  * identity. The rewrite is value-identical on EVERY input — [[DotProduct]]
  * reproduces the HOF form's left-to-right summation, its NULL on
  * length-mismatched arrays (zip_with null-padding) and its NULL
  * propagation from null elements — so no additional containsNull /
  * equal-length guard is needed here.
  */
object DotFusionRule extends Rule[LogicalPlan] {

  private def isVar(e: Expression): Boolean = e.isInstanceOf[NamedLambdaVariable]

  private def isIdentityFinish(e: Expression): Boolean = e match {
    case LambdaFunction(body, Seq(arg), _) => body.semanticEquals(arg)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(Multiply(x, y, _), _, _)),
          Literal(zero, DoubleType),
          LambdaFunction(Add(acc, v, _), _, _),
          finish)
        if zero == 0.0 && isVar(x) && isVar(y) && isVar(acc) && isVar(v) &&
          isIdentityFinish(finish) &&
          a.dataType.isInstanceOf[ArrayType] &&
          a.dataType.asInstanceOf[ArrayType].elementType == DoubleType &&
          b.dataType.isInstanceOf[ArrayType] &&
          b.dataType.asInstanceOf[ArrayType].elementType == DoubleType =>
      DotProduct(a, b)
  }
}

/** Session extensions: `dot_product` as a SQL function plus the fusion
  * rule. Wire at session build time with
  * `.withExtensions(new GraftExtensions)`, or retrofit an existing session
  * with [[GraftExtensions.install]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => DotFusionRule)
  }
}

object GraftExtensions {

  private def intLit(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn requires a literal INT argument, got $other")
  }

  private[functions] val dotProductFunction =
    (FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1)): Expression)

  /** The full SQL-function surface: the fused dot product plus the native
    * text kernels (same expressions the dedup queries use), so a SQL-only
    * user reaches them without touching the Scala API. */
  private[functions] val functions = Seq(
    dotProductFunction,
    (FunctionIdentifier("shingle_band_mins"),
      new ExpressionInfo(classOf[ShingleBandMins].getName, "shingle_band_mins"),
      (c: Seq[Expression]) =>
        ShingleBandMins(c(0), intLit(c(1), "shingle_band_mins")): Expression),
    (FunctionIdentifier("shingle_min_k"),
      new ExpressionInfo(classOf[ShingleMinK].getName, "shingle_min_k"),
      (c: Seq[Expression]) =>
        ShingleMinK(c(0), intLit(c(1), "shingle_min_k")): Expression),
    (FunctionIdentifier("ngram_strings"),
      new ExpressionInfo(classOf[NgramStrings].getName, "ngram_strings"),
      (c: Seq[Expression]) =>
        NgramStrings(c(0), intLit(c(1), "ngram_strings")): Expression),
    (FunctionIdentifier("simhash_bands"),
      new ExpressionInfo(classOf[SimHashBands].getName, "simhash_bands"),
      (c: Seq[Expression]) =>
        SimHashBands(c(0), intLit(c(1), "simhash_bands"),
          intLit(c(2), "simhash_bands")): Expression),
    (FunctionIdentifier("hashed_ngram_set"),
      new ExpressionInfo(classOf[HashedNgramSet].getName, "hashed_ngram_set"),
      (c: Seq[Expression]) =>
        HashedNgramSet(c(0), intLit(c(1), "hashed_ngram_set")): Expression))

  /** Idempotently add the fusion rule + SQL functions to a live session. */
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(DotFusionRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ DotFusionRule
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
  }
}
