package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project, ResolvedHint, SubqueryAlias}

/** Round-10 plan-regression guards: no forced broadcast of anything
  * that grows with scale factor.
  *
  * Rule (from the 100 TB audit): an explicit broadcast() hint is
  * allowed ONLY on (a) subtrees whose every leaf is a schema-bounded
  * dim (nation: 25 rows, region: 5 rows — detected by column prefix,
  * the only relations carrying n_/r_ columns), or (b) guaranteed-
  * one-row frames (a global Aggregate with no grouping expressions).
  * customer/supplier/part/filtered-orders and data-dependent aggregate
  * frames (HAVING output, per-key averages/minima) are SF-linear or
  * selectivity-dependent — at the 100 TB target they blow Spark's
  * 8 GB / 512M-row broadcast hard cap, so they must reach AQE
  * unhinted and get sized at runtime.
  */
class Round10Spec extends SparkSpec {

  /** Hints in the analyzed plan that violate the bounded-build rule. */
  private def unboundedHints(df: DataFrame): Seq[String] = {
    @annotation.tailrec
    def root(p: LogicalPlan): LogicalPlan = p match {
      case Project(_, c)       => root(c)
      case SubqueryAlias(_, c) => root(c)
      case other               => other
    }
    df.queryExecution.analyzed.collect { case h: ResolvedHint => h }.flatMap { h =>
      val oneRow = root(h.child) match {
        case a: Aggregate => a.groupingExpressions.isEmpty
        case _            => false
      }
      val leafCols = h.child.collectLeaves().flatMap(_.output.map(_.name))
      val dimOnly = leafCols.nonEmpty &&
        leafCols.forall(n => n.startsWith("n_") || n.startsWith("r_"))
      if (oneRow || dimOnly) None
      else Some(s"hint over ${leafCols.distinct.mkString(",")}")
    }
  }

  private val family: Map[String, DataFrame] = {
    val t = tables
    Map(
      "q1"  -> Analytics.q1Agg(t),
      "q3"  -> Analytics.q3Shipping(t),
      "q5"  -> Analytics.q5Local(t),
      "q4"  -> Relational.q4Priority(t),
      "q6"  -> Relational.q6Forecast(t),
      "q12" -> Relational.q12Shipmode(t),
      "q14" -> Relational.q14Promo(t),
      "q7"  -> TpcHShapes.q7Volume(t),
      "q8"  -> TpcHShapes.q8Share(t),
      "q9"  -> TpcHShapes.q9Profit(t),
      "q10" -> TpcHShapes.q10Returns(t),
      "q13" -> TpcHShapes.q13CustDist(t),
      "q15" -> TpcHShapes.q15TopSupp(t),
      "q17" -> TpcHShapes.q17SmallQty(t),
      "q18" -> TpcHShapes.q18BigOrder(t),
      "q19" -> TpcHShapes.q19Disc(t),
      "q21" -> TpcHShapes.q21Waiting(t),
      "q2"  -> TpcHShapes.q2MinCost(t),
      "q11" -> TpcHShapes.q11Important(t),
      "q16" -> TpcHShapes.q16PartSupp(t),
      "q20" -> TpcHShapes.q20Potential(t),
      "q22" -> TpcHShapes.q22Idle(t))
  }

  test("TPC-H family: every broadcast hint is schema-bounded or one-row") {
    val bad = family.toSeq.sortBy(_._1).flatMap { case (name, df) =>
      unboundedHints(df).map(v => s"$name: $v")
    }
    assert(bad.isEmpty, s"SF-linear broadcast hints found:\n${bad.mkString("\n")}")
  }

  test("TPC-H family: the de-hinted queries still produce rows at sf0.001") {
    // Semantics guard for the de-hint change itself: the formerly
    // hinted queries must stay non-degenerate (full value parity is
    // the driver's DuckDB gate; q7's nation pair only co-occurs from
    // sf0.01 up, so it is covered there, not here).
    for (name <- Seq("q3", "q5", "q9", "q10", "q14", "q15", "q16", "q18", "q19"))
      assert(family(name).limit(1).count() == 1L, s"$name returned no rows")
  }
}
