package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.CartesianProductExec

/** Engine-wide PLAN hygiene sweep: every registered query's physical
  * plan is built (planning only — nothing executes) and checked for
  * the one shape that silently kills a 100 TB run: an UNBOUNDED
  * non-equi join. Broadcast nested-loop joins against a BROADCAST side
  * are the sanctioned scalar/centroid pattern (the small side is
  * bounded by the broadcast threshold); CartesianProductExec — both
  * sides unbounded — is allowed only on the explicit whitelist of
  * oracle twins that are quadratic BY CONSTRUCTION and paired with a
  * scale twin. A regression that drops a broadcast hint or breaks an
  * equi-join condition anywhere in the 200+ query surface fails here
  * by name, not in a 3 a.m. production run. */
class PlanHygieneSpec extends SparkSpec {

  /** Quadratic-by-construction oracle twins would be whitelisted here;
    * currently EMPTY — even q_bitext_mine's declared dense matrix
    * plans as a broadcast nested-loop (its small side fits the
    * broadcast threshold, so the executor never materializes an
    * unbounded two-sided product), leaving zero CartesianProductExec
    * across the whole registered surface. */
  private val cartesianWhitelist = Set.empty[String]

  private def cartesians(p: SparkPlan): Int = {
    val self = p match {
      case _: CartesianProductExec => 1
      case a: AdaptiveSparkPlanExec => cartesians(a.inputPlan)
      case _ => 0
    }
    // children only: physical plans may still carry LOGICAL subquery
    // placeholders pre-execution (not SparkPlan — a cast trap)
    self + p.children.map(cartesians).sum
  }

  test("no registered query plans an unbounded cartesian product (whitelist: the declared oracle twins)") {
    // sf0.001 keeps the table-layer queries' side-effecting setup cheap;
    // planning is forced via sparkPlan without executing the query
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val n = try cartesians(fn(spark, sfDir).queryExecution.sparkPlan)
        finally {
          CacheRegistry.drain()
          spark.catalog.clearCache()
          // some queries localCheckpoint EAGERLY during construction
          // (components/graph closures) — clearCache never covers those
          // blocks, and leaking them skews other suites' cache counts
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = false))
        }
        if (n > 0 && !cartesianWhitelist.contains(name)) Some(name -> n)
        else None
    }
    assert(offenders.isEmpty,
      s"unbounded cartesian joins planned by: ${offenders.mkString(", ")}")
  }

  test("the cartesian whitelist is not stale: every entry still plans one") {
    // a whitelist entry whose query stopped planning a cartesian would
    // silently widen the allowance for future regressions — each entry
    // must still EARN its exemption (vacuously green while empty)
    cartesianWhitelist.foreach { name =>
      val n = try cartesians(
        SparkEntry.queries(name)(spark, sfDir).queryExecution.sparkPlan)
      finally {
        CacheRegistry.drain()
        spark.catalog.clearCache()
      }
      assert(n > 0, s"whitelisted $name no longer plans a cartesian — " +
        "remove it from the whitelist")
    }
  }
}
