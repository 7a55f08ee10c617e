package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the compose-built-ins cosine —
  * `dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))` with dot as the
  * `aggregate(zip_with(...))` HOF chain — into the codegen'd
  * [[CosineSimilarity]] expression. A user who writes the natural HOF
  * form (the shape [[graft.vector.Similarity.cosineHof]] builds, and the
  * obvious hand-rolled SQL) silently gets the fused-loop expression the
  * hot paths use; higher-order lambdas are interpreted per element, so
  * on a 64-dim embedding the rewrite removes ~190 interpreted
  * evaluations per row.
  *
  * Safety: fires only on the EXACT cosine shape — the numerator's dot
  * over (x, y) and the two denominator dots over (x, x) and (y, y), all
  * three with the canonical multiply-cast / add / identity lambdas, both
  * children deterministic float arrays (checked semantically, so
  * aliased subtrees match). [[CosineSimilarity]] is spec-pinned
  * bit-identical to the HOF chain on well-formed input, including NULL
  * propagation for null elements AND the zero-norm/empty-array case,
  * which follows the HOF form's `Divide` semantics exactly (NULL when
  * ANSI is off, DIVIDE_BY_ZERO when ANSI is on — spec-pinned both
  * modes). The one remaining divergence is MALFORMED input
  * (length-mismatched arrays), where the expression throws where the HOF
  * form silently returned NULL — the engine's fail-loudly contract (the
  * LshBucket precedent), documented here because the rewrite widens it
  * to HOF spellings.
  *
  * Injected by [[GraftExtensions]] (`injectOptimizerRule`); tests apply
  * it to an existing session via `spark.experimental.extraOptimizations`.
  */
object RewriteHofCosine extends Rule[LogicalPlan] {

  /** The canonical HOF dot product over two float-array expressions:
    * aggregate(zip_with(x, y, (a, b) -> double(a) * double(b)), 0.0,
    * (acc, v) -> acc + v, id) → Some((x, y)).
    */
  private def dotOf(e: Expression): Option[(Expression, Expression)] = e match {
    case ArrayAggregate(zw: ZipWith, Literal(zero, DoubleType),
        merge: LambdaFunction, finish: LambdaFunction)
        if zero == 0.0 && isCastProduct(zw.function) &&
          isPlainSum(merge) && isIdentity(finish) =>
      Some((zw.left, zw.right))
    case _ => None
  }

  private def isCastProduct(f: Expression): Boolean = f match {
    case LambdaFunction(
        Multiply(Cast(a: NamedLambdaVariable, DoubleType, _, _),
          Cast(b: NamedLambdaVariable, DoubleType, _, _), _),
        Seq(p: NamedLambdaVariable, q: NamedLambdaVariable), _) =>
      a.exprId == p.exprId && b.exprId == q.exprId
    case _ => false
  }

  private def isPlainSum(f: LambdaFunction): Boolean = f match {
    case LambdaFunction(
        Add(a: NamedLambdaVariable, b: NamedLambdaVariable, _),
        Seq(p: NamedLambdaVariable, q: NamedLambdaVariable), _) =>
      a.exprId == p.exprId && b.exprId == q.exprId
    case _ => false
  }

  private def isIdentity(f: LambdaFunction): Boolean = f match {
    case LambdaFunction(a: NamedLambdaVariable,
        Seq(p: NamedLambdaVariable), _) => a.exprId == p.exprId
    case _ => false
  }

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case d @ Divide(num, Multiply(Sqrt(dxx), Sqrt(dyy), _), _) =>
        (dotOf(num), dotOf(dxx), dotOf(dyy)) match {
          case (Some((x, y)), Some((xa, xb)), Some((ya, yb)))
              if xa.semanticEquals(x) && xb.semanticEquals(x) &&
                ya.semanticEquals(y) && yb.semanticEquals(y) &&
                isFloatArray(x) && isFloatArray(y) &&
                x.deterministic && y.deterministic =>
            CosineSimilarity(x, y)
          case _ => d
        }
    }
}
