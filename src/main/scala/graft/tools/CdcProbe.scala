package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the SnapshotStore CDC loop: the claim under test is
  * that a changelog read is O(changed files) — its cost tracks the
  * DELTA, not the table. Cells: base table of 10× different sizes
  * (range-partitioned into the same file count, stats-tracked), an
  * identical narrow-range 1k-row mergeCommit against each, then the
  * keyed readChanges between the two versions. Asserted scale-sensitive
  * quantities (the round-14 lesson): the changelog's update count
  * equals the batch size, and the file count the CDC read opens is the
  * SET DIFFERENCE (merge-touched files × 2), not the manifest.
  *
  * Usage: CdcProbe [baseRows...]  (default 100000 1000000)
  */
object CdcProbe {
  def main(args: Array[String]): Unit = {
    val bases = if (args.nonEmpty) args.map(_.toLong).toSeq
                else Seq(100000L, 1000000L)
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

    def cell(base: Long): String = {
      val path = java.nio.file.Files
        .createTempDirectory("graft-cdcprobe").toString + "/t"
      val (_, tCommit) = timed {
        SnapshotStore.commit(
          spark.range(base).select(col("id"), (col("id") * 3).as("v"))
            .repartitionByRange(32, col("id"))
            .sortWithinPartitions("id"),
          path, statsKey = Some("id"))
      }
      // identical 1k-key batch at every base size: constant delta
      val batch = spark.range(5000, 6000)
        .select(col("id"), lit(-1L).as("v"))
      val (_, tMerge) = timed {
        SnapshotStore.mergeCommit(spark, path, batch, "id")
      }
      val (updates, tCdc) = timed {
        SnapshotStore.readChanges(spark, path, 1, 2, Some("id"))
          .filter(col("_change") === "update").count()
      }
      val openedFiles = SnapshotStore.readChanges(spark, path, 1, 2,
        Some("id")).inputFiles.length
      val manifestFiles = SnapshotStore.read(spark, path).inputFiles.length
      assert(updates == 1000L, s"expected 1000 updates, got $updates")
      assert(openedFiles > 0 && openedFiles < manifestFiles,
        s"CDC read opened $openedFiles of $manifestFiles — no pruning")
      s"""{"base_rows":$base,"commit_sec":${f"$tCommit%.2f"},""" +
        s""""merge_sec":${f"$tMerge%.2f"},"cdc_sec":${f"$tCdc%.2f"},""" +
        s""""cdc_updates":$updates,"cdc_files_opened":$openedFiles,""" +
        s""""table_files":$manifestFiles}"""
    }
    cell(bases.head) // JIT/codegen warm-up, dropped
    val cells = bases.map(cell)
    println(s"""{"probe":"cdc","cells":[${cells.mkString(",")}]}""")
    spark.stop()
  }
}
