package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the r16 distributed stats checkpoint: the claim
  * under test is that SnapshotStore pruning is a SCAN of a parquet
  * checkpoint frame — the driver never materializes per-file stats —
  * so a point readWhere's cost tracks the (constant) surviving file
  * set, not the manifest. Cells: tables of the SAME row count split
  * into 10× different file counts (range-disjoint, stats-tracked),
  * then an identical point-range readWhere against each. Asserted
  * scale-sensitive quantities: files opened by the pruned scan stays
  * ~constant while the manifest grows 10×, and the checkpoint holds
  * one range row per file (proving the driver-free path is the one
  * exercised — the text sidecar has no body to fall back to).
  *
  * Usage: StatsCheckpointProbe [fileCounts...]  (default 1000 10000)
  */
object StatsCheckpointProbe {
  def main(args: Array[String]): Unit = {
    val counts = if (args.nonEmpty) args.map(_.toInt).toSeq
                 else Seq(1000, 10000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.GraftSession.tune(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sinks.SnapshotStore

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val rows = 1000000L
    def cell(nFiles: Int): String = {
      val path = java.nio.file.Files
        .createTempDirectory("graft-statsprobe").toString + "/t"
      val (_, tCommit) = timed {
        SnapshotStore.commit(
          spark.range(rows).select(col("id"), (col("id") * 3).as("v"))
            .repartitionByRange(nFiles, col("id"))
            .sortWithinPartitions("id"),
          path, statsKey = Some("id"))
      }
      val ckRows = spark.read.parquet(
        new java.io.File(new java.io.File(path, "_snapshots"),
          "v00000001.statspq").getPath).count()
      assert(ckRows == nFiles.toLong,
        s"checkpoint rows $ckRows != files $nFiles")
      // identical point range at every file count: constant answer,
      // constant surviving file set
      val (got, tRead) = timed {
        val w = SnapshotStore.readWhere(spark, path, "id", 5000, 5099)
        (w.inputFiles.length, w.count())
      }
      val (opened, n) = got
      assert(n == 100L, s"expected 100 rows, got $n")
      assert(opened <= 3,
        s"point readWhere opened $opened of $nFiles files — no pruning")
      s"""{"files":$nFiles,"commit_sec":${f"$tCommit%.2f"},""" +
        s""""readwhere_sec":${f"$tRead%.2f"},"files_opened":$opened,""" +
        s""""checkpoint_rows":$ckRows}"""
    }
    cell(counts.head) // JIT/codegen warm-up, dropped
    val cells = counts.map(cell)
    println(s"""{"probe":"stats_checkpoint","cells":[${cells.mkString(",")}]}""")
    spark.stop()
  }
}
