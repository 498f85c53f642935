package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dynamic partition pruning: joining a PARTITIONED fact table against
  * a filtered dimension must prune fact partitions at RUNTIME from the
  * dim's join keys — on a 100 TB events table partitioned by day/type,
  * this is the difference between scanning 3 partitions and 3000.
  * The layout (TableWriter.writePartitioned) and the session config
  * make it fire; this spec keeps that contract honest. */
class DynamicPruningSpec extends SparkSpec {
  import spark.implicits._

  test("filtered dim join prunes fact partitions at runtime") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    graft.sinks.TableWriter.writePartitioned(tables.events, dir, "event_type")
    val fact = spark.read.parquet(dir)
    // dim must be a FILTERED SCAN (not a folded local relation) for the
    // PartitionPruning rule to judge the filter selective and reuse the
    // broadcast as a pruning subquery on the fact side
    val dimDir = java.nio.file.Files.createTempDirectory("graft-dpp-dim").toString
    Seq(("click", 1L), ("view", 2L), ("purchase", 3L),
      ("scroll", 4L), ("search", 5L)).toDF("event_type", "weight")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
      .filter(col("weight") === 1L) // survives: click only
    val j = fact.join(dim, Seq("event_type"))
      .agg(count(lit(1)).as("n"))
    val n = j.head.getLong(0)
    val expected = tables.events.filter(col("event_type") === "click").count()
    assert(n == expected)
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") || plan.contains("DynamicPruning"),
      s"expected a dynamic pruning subquery in:\n${plan.take(2000)}")
  }

  test("AQE splits a skewed join partition at runtime") {
    import org.apache.spark.sql.functions.{col, lit, when}
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      .map(k => k -> conf.get(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      // one hot key holding ~half the rows — with a payload column that
      // survives the join so the hot partition is physically big
      val big = spark.range(200000L)
        .select(when(col("id") % 2 === 0, lit(7L)).otherwise(col("id")).as("k"),
          org.apache.spark.sql.functions.md5(col("id").cast("string")).as("payload"))
      val small = spark.range(1000L).select(col("id").as("k"), lit(1L).as("w"))
      // aggregate to keep collect() tiny; collect() (not count()) so THIS
      // QueryExecution runs and AQE finalizes it
      val j = big.join(small, Seq("k"))
        .groupBy(col("w"))
        .agg(org.apache.spark.sql.functions.max(col("payload")).as("mx"))
      assert(j.collect().forall(_.getString(1).nonEmpty))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE skew split in:\n${plan.take(2000)}")
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
  }
}
