package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** r17 operator gates: the span-classed interval join. */
class SpanClassedIntervalSpec extends SparkSpec {
  import spark.implicits._

  /** Heavy-tailed synthetic intervals: most spans ≤ 10, a few huge. */
  private def intervals = spark.range(0, 400).select(
    (col("id") % 7).as("pk"),
    col("id").as("id"),
    (col("id") * 13 % 500).as("s"),
    when(col("id") % 50 === 0, lit(300L) + col("id") % 77)
      .otherwise(col("id") % 10 + 1).as("tr"))
    .withColumn("r", col("s") + col("tr"))
    .select("pk", "id", "s", "r")

  private def brute = {
    val a = intervals.select(col("pk"), col("id").as("id_a"),
      col("s").as("s_a"), col("r").as("r_a"))
    val b = intervals.select(col("pk"), col("id").as("id_b"),
      col("s").as("s_b"), col("r").as("r_b"))
    a.join(b, Seq("pk"))
      .filter(col("id_a") < col("id_b") &&
        col("s_a") <= col("r_b") && col("s_b") <= col("r_a"))
      .select(col("pk"),
        (least(col("r_a"), col("r_b")) -
          greatest(col("s_a"), col("s_b")) + 1).as("od"))
  }

  test("span-classed pairs == all-pairs definition on heavy-tailed spans") {
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("pk").agg(count(lit(1)).as("n"), sum("od").as("od_sum"),
        max("od").as("od_max"))
        .as[(Long, Long, Long, Long)].collect().toSet
    assert(agg(RangeJoin.spanClassedPairs(intervals, threshold = 10L)) ==
      agg(brute))
  }

  test("plan: long-class joins broadcast, no cartesian product anywhere") {
    val plan = RangeJoin.spanClassedPairs(intervals, threshold = 10L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "long-tail pairs must plan as broadcast hash joins")
    assert(!plan.contains("CartesianProduct"),
      "span-classed join must never plan a cartesian product")
  }

  test("broadcast premise is guarded: an oversized long tail aborts with guidance") {
    val ex = intercept[IllegalArgumentException] {
      RangeJoin.spanClassedPairs(intervals, threshold = 10L,
        maxLongRows = 2L).count()
    }
    assert(ex.getMessage.contains("raise the threshold"))
  }

  test("degenerate classes: all-short and all-long inputs are both total") {
    val allShort = intervals.filter(col("r") - col("s") <= 10)
    val allLong = intervals.filter(col("r") - col("s") > 10)
    // all-short: long side empty → grid only
    assert(RangeJoin.spanClassedPairs(allShort, 10L).count() > 0)
    // all-long: grid empty → broadcast self-pairing only
    assert(RangeJoin.spanClassedPairs(allLong, 10L).count() ==
      allLong.as("a").join(allLong.as("b"),
        col("a.pk") === col("b.pk") && col("a.id") < col("b.id") &&
          col("a.s") <= col("b.r") && col("b.s") <= col("a.r")).count())
  }
}
