package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: rewrites the declarative higher-order-function dot
  * product — `aggregate(zip_with(a, b, (x,y) => round(x*1e6)L *
  * round(y*1e6)L), 0L, _+_)`, the form [[graft.functions.VecFuncs.dotE12]]
  * builds — into the codegen'd [[DotProductE12]] expression.
  *
  * Users (and graft's own operators) can write the portable HOF form;
  * with the rule installed (`spark.sql.extensions=graft.GraftExtensions`)
  * the optimizer swaps in the tight-loop native expression. The match
  * is deliberately conservative: anything that doesn't look exactly
  * like the canonical pattern is left untouched, so the rule can never
  * change semantics of unrelated aggregates.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  /** Unwrap `CAST(ROUND(x * 1e6, 0) AS BIGINT)` → x. */
  private def unwrapE6(e: Expression): Option[Expression] = e match {
    case Cast(r: Round, LongType, _, _) => r.child match {
      case Multiply(x, Literal(m: Double, DoubleType), _) if m == 1000000.0d =>
        r.scale match {
          case Literal(0, _) => Some(x)
          case _ => None
        }
      case _ => None
    }
    case _ => None
  }

  private def sameVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case Cast(nv: NamedLambdaVariable, DoubleType, _, _) => nv.exprId == v.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(Multiply(l, r, _), Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(0L, LongType),
          LambdaFunction(Add(accRef, vRef, _), Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
          finish)
        if sameVar(accRef, acc) && sameVar(vRef, v) &&
          unwrapE6(l).exists(sameVar(_, x)) && unwrapE6(r).exists(sameVar(_, y)) &&
          isIdentity(finish) =>
      DotProductE12(a, b)
  }

  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(body, Seq(arg: NamedLambdaVariable), _) => sameVar(body, arg)
    case _ => false
  }
}
