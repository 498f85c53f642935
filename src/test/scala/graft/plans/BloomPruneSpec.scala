package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning: when a shuffle join's build side
  * is selective, Spark injects a `might_contain` semi-filter on the
  * probe side so non-matching rows die at the scan instead of crossing
  * the shuffle. At 100 TB this is the difference between shuffling the
  * full fact table and shuffling only rows that can possibly join —
  * the engine relies on it for big-big joins where neither side
  * broadcasts, so this spec pins (a) the injection actually fires on
  * this Spark build and (b) results are unchanged by the rewrite.
  */
class BloomPruneSpec extends SparkSpec {

  private def withConf[A](pairs: (String, String)*)(f: => A): A = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def selectiveJoin() = {
    val t = tables
    val sel = t.orders.filter(col("o_totalprice") > 9999.0)
      .select(col("o_orderkey"))
    t.lineitem.join(sel, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(sum(col("l_quantity").cast("decimal(9,2)")).cast("double").as("qty"))
      .orderBy(col("o_orderkey"))
  }

  test("selective shuffle join gets a runtime bloom filter on the probe side") {
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val plan = selectiveJoin().queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"), s"no bloom filter injected:\n$plan")
    }
  }

  test("bloom-pruned join returns identical results to the plain join") {
    val pruned = withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      selectiveJoin().collect().toSeq
    }
    val plain = withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
      selectiveJoin().collect().toSeq
    }
    assert(pruned == plain)
    assert(pruned.nonEmpty)
  }
}
