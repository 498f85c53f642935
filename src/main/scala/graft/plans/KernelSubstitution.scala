package graft.plans

import graft.functions.DotProduct
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the declarative dot-product idiom
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)
  *
  * into graft's codegen'd `DotProduct(a, b)` kernel. Higher-order
  * functions evaluate interpreted (one closure call per element); the
  * kernel is a primitive-array loop inside whole-stage codegen with
  * identical ascending-index accumulation, so the rewrite is
  * result-preserving bit-for-bit. Users keep writing the declarative
  * form; the plan gets the kernel.
  */
object KernelSubstitution extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _), _, _)),
          Literal(0.0, DoubleType),
          LambdaFunction(Add(acc: NamedLambdaVariable, v: NamedLambdaVariable, _), _, _),
          LambdaFunction(fin: NamedLambdaVariable, _, _))
        if isDoubleArray(a) && isDoubleArray(b) &&
          x.dataType == DoubleType && y.dataType == DoubleType =>
      DotProduct(a, b)
  }
}
