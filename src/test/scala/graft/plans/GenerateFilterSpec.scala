package graft.plans

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.execution.{FilterExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

/** Pins the InferFiltersFromGenerate exclusion (GraftSession.tune).
  *
  * The rule rewrites every explode(e) into a pushed pre-filter
  * `size(e) > 0 AND isnotnull(e)`; PushDownPredicates sinks it below
  * the fan-out exchange, where the generator's interpreted HOF array
  * build (transform + concat_ws + array_distinct for word n-grams)
  * re-runs twice per row in the narrow single-task pre-spread stage —
  * measured 7.0 s vs 0.27 s on q_hll_audit's shingle scan at sf0.1
  * (tools.HllProbe). The Generate drops empty arrays itself one
  * operator later, so the filter never changes results. */
class GenerateFilterSpec extends SparkSpec {
  import spark.implicits._

  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val inner = p match {
      case q: QueryStageExec        => Seq(q.plan)
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case _                        => Seq.empty
    }
    p +: (p.children ++ inner).flatMap(allNodes)
  }

  private def shingleExplode() =
    Dedup.shingled(tables.documents.select($"doc_id", $"text"), 3)
      .select(explode($"sh").as("g"))

  test("no inferred pre-exchange filter under the shingle explode") {
    val q = shingleExplode()
    q.count() // finalize the adaptive plan before walking it
    val filters = allNodes(q.queryExecution.executedPlan)
      .collect { case f: FilterExec => f }
    assert(filters.isEmpty,
      s"inferred generate filter resurfaced: ${filters.mkString("; ")}")
  }

  test("excluding the rule changes the plan, not the rows") {
    val expect = shingleExplode().groupBy($"g").count()
      .as[(String, Long)].collect().toMap
    assert(expect.nonEmpty)
    val key = "spark.sql.optimizer.excludedRules"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "") // vanilla optimizer: rule back ON
      val q = shingleExplode()
      q.count()
      val filters = allNodes(q.queryExecution.executedPlan)
        .collect { case f: FilterExec => f }
      assert(filters.nonEmpty, "rule enabled but no inferred filter — " +
        "the exclusion may be pinning a rule Spark no longer applies")
      val got = q.groupBy($"g").count().as[(String, Long)].collect().toMap
      assert(got == expect)
    } finally prev.foreach(spark.conf.set(key, _))
  }
}
