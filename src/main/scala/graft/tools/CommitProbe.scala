package graft.tools

import graft.GraftSession
import graft.sinks.SnapshotStore
import graft.sources.Tables
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.functions._

/** Phase-level timing probe for the SnapshotStore commit path (r18
  * optimization round): wraps each table-layer verb of the
  * q_snapshot_dv sequence in a labelled timer and counts the Spark
  * jobs each verb schedules, so the per-commit constant is attributed
  * by measurement (guide §1.1). */
object CommitProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("commit-probe")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onJobEnd(je: SparkListenerJobEnd): Unit = ()
    })
    val t = Tables(spark, sfDir)
    def time[A](label: String)(f: => A): A = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $label%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s  " +
        f"jobs=${jobs.get() - j0}")
      r
    }
    // warm one full pass so JIT/codegen is out of the measured pass
    (1 to 6).foreach { pass =>
      if (pass == 3) {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        println("=== AQE OFF, parts unchanged ===")
      }
      if (pass == 5) {
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        println("=== AQE OFF, parts=8 ===")
      }
      println(s"--- pass $pass ---")
      val dir = java.nio.file.Files
        .createTempDirectory("graft-probe").toString + "/t"
      val o = t.orders.select(col("o_orderkey"), col("o_orderstatus"))
      time("commit(stats,range8)") {
        SnapshotStore.commit(
          o.repartitionByRange(8, col("o_orderkey"))
            .sortWithinPartitions("o_orderkey"),
          dir, statsKey = Some("o_orderkey"))
      }
      time("deleteVectorCommit") {
        SnapshotStore.deleteVectorCommit(spark, dir,
          o.filter(col("o_orderkey") % 11 === 0).select(col("o_orderkey")),
          "o_orderkey")
      }
      time("compact") {
        SnapshotStore.compact(spark, dir, targetBytes = 16L << 20)
      }
      time("read+agg") {
        SnapshotStore.read(spark, dir)
          .groupBy(col("o_orderstatus")).agg(count(lit(1))).count()
      }
      time("readChanges+agg") {
        SnapshotStore.readChanges(spark, dir, 1, 2, Some("o_orderkey"))
          .filter(col("_change") === "delete")
          .groupBy(col("o_orderstatus")).agg(count(lit(1))).count()
      }
    }
    spark.stop()
  }
}
