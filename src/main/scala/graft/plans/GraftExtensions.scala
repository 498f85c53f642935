package graft.plans

import graft.functions.{RollingHashes, SimHash64}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extension entry point: deploys graft into any Spark cluster
  * via `--conf spark.sql.extensions=graft.plans.GraftExtensions` — no
  * code changes in the host application. Injects the kernel-substitution
  * optimizer rule and registers the custom expressions for SQL. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => KernelSubstitution)
    ext.injectFunction((
      FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getCanonicalName, "graft_simhash64"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => SimHash64(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_rolling_hashes"),
      new ExpressionInfo(classOf[RollingHashes].getCanonicalName, "graft_rolling_hashes"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        RollingHashes(exprs.head, 8)))
  }
}
