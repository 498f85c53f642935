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
  * identical ascending-index accumulation.
  *
  * Result preservation is enforced, not assumed: the rule only fires
  * when both arrays are `ArrayType(DoubleType, containsNull = false)`
  * (a null element makes the HOF fold NULL, which the kernel cannot
  * reproduce), and the kernel is wrapped in a length-equality check —
  * `zip_with` pads the shorter array with nulls so unequal lengths
  * make the HOF yield NULL, and the substituted form returns NULL for
  * exactly those rows too. A NULL array input short-circuits to NULL
  * on both spellings (Size(null) = null → If condition not true →
  * null branch; the HOF is null-propagating). With those guards the
  * rewrite is result-preserving bit-for-bit on every input, which is
  * what lets GraftExtensions inject it cluster-wide.
  */
object KernelSubstitution extends Rule[LogicalPlan] {

  private def isNonNullDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, containsNull) => !containsNull
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _), _, _)),
          Literal(0.0, DoubleType),
          LambdaFunction(Add(acc: NamedLambdaVariable, v: NamedLambdaVariable, _), _, _),
          LambdaFunction(fin: NamedLambdaVariable, _, _))
        if isNonNullDoubleArray(a) && isNonNullDoubleArray(b) &&
          x.dataType == DoubleType && y.dataType == DoubleType =>
      If(EqualTo(Size(a), Size(b)), DotProduct(a, b), Literal(null, DoubleType))
  }
}
