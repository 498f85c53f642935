package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregation: HLL (DataSketches) with
  * mergeable partial sketches — the 100 TB pattern where per-partition
  * sketches union without re-scanning, and accuracy is a tunable. */
class SketchSpec extends SparkSpec {

  test("hll_sketch_agg approximates exact distinct within expected error") {
    val exact = tables.events.select(countDistinct(col("user_id"))).head.getLong(0)
    val approx = tables.events
      .select(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .head.getLong(0)
    val err = math.abs(approx - exact).toDouble / exact
    assert(err < 0.05, s"exact=$exact approx=$approx err=$err")
  }

  test("partial sketches union to the global estimate (mergeability)") {
    val partials = tables.events
      .groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val merged = partials
      .select(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head.getLong(0)
    val exact = tables.events.select(countDistinct(col("user_id"))).head.getLong(0)
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"merged=$merged exact=$exact")
  }

  test("approx_count_distinct (HLL++) tracks exact counts per group") {
    val r = tables.events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact"),
        approx_count_distinct(col("user_id"), 0.02).as("approx"))
      .collect()
    r.foreach { row =>
      val (e, a) = (row.getLong(1), row.getLong(2))
      assert(math.abs(a - e).toDouble / e < 0.1, s"$row")
    }
  }

  test("approx_percentile lands within the accuracy-implied rank error") {
    val acc = 100 // rank error <= n/acc
    val n = tables.events.count()
    val approx = tables.events
      .select(percentile_approx(col("value"), lit(0.5), lit(acc)).as("p"))
      .head.getDouble(0)
    // exact rank of the approximate answer must be within n/acc of n/2
    val below = tables.events.filter(col("value") <= approx).count()
    val rankErr = math.abs(below - n / 2.0) / n
    assert(rankErr <= 1.0 / acc + 0.01, s"approx=$approx rankErr=$rankErr")
  }
}
