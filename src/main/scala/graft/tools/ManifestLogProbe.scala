package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe for the r17 O(delta) manifest log: the claim under test
  * is that a COMMIT's cost no longer depends on how many files the
  * table already has — an append reads/writes O(new files) of manifest
  * state (one header probe + one delta manifest), where the r16 design
  * loaded and rewrote the full file list every commit. Cells: tables
  * pre-seeded to 10× different file counts, then identical one-file
  * appends and a point merge against each. Asserted scale-sensitive
  * quantities: the append's delta manifest holds exactly its own files
  * (bytes independent of table size), and append wall-time stays flat
  * across the 10× file-count step (within noise; the amortized FULL
  * checkpoint is excluded by keeping the interval above the appends).
  *
  * Usage: ManifestLogProbe [fileCounts...]  (default 1000 10000)
  */
object ManifestLogProbe {
  def main(args: Array[String]): Unit = {
    val counts = if (args.nonEmpty) args.map(_.toInt).toSeq
                 else Seq(1000, 10000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.GraftSession.tune(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sinks.SnapshotStore
    import spark.implicits._

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val rows = 1000000L
    def cell(nFiles: Int): (Double, String) = {
      val path = java.nio.file.Files
        .createTempDirectory("graft-mlogprobe").toString + "/t"
      SnapshotStore.commit(
        spark.range(rows).select(col("id"), (col("id") * 3).as("v"))
          .repartitionByRange(nFiles, col("id"))
          .sortWithinPartitions("id"),
        path, statsKey = Some("id"))
      // median of 5 one-row appends (the steady-state commit shape)
      val ts = (1 to 5).map { i =>
        timed {
          SnapshotStore.commit(
            Seq((rows * 10 + i, 1L)).toDF("id", "v"), path,
            SaveMode.Append, statsKey = Some("id"))
        }._2
      }.sorted
      val tAppend = ts(2)
      // the append's manifest is O(its own files), not O(table)
      val v = SnapshotStore.latestVersion(path)
      val mBytes = new java.io.File(
        new java.io.File(path, "_snapshots"), f"v$v%08d.manifest").length()
      assert(mBytes < 4096,
        s"append manifest is $mBytes bytes at $nFiles files — not a delta")
      // a point merge stays O(touched): one file dropped, one added
      val (_, tMerge) = timed {
        SnapshotStore.mergeCommit(spark, path,
          Seq((5000L, -1L)).toDF("id", "v"), "id")
      }
      (tAppend,
        s"""{"files":$nFiles,"append_sec":${f"$tAppend%.3f"},""" +
          s""""merge_sec":${f"$tMerge%.2f"},"delta_manifest_bytes":$mBytes}""")
    }
    cell(counts.head) // JIT/codegen warm-up, dropped
    val cells = counts.map(cell)
    val flat = cells.last._1 / math.max(cells.head._1, 1e-9)
    println(s"""{"probe":"manifest_log","append_ratio_at_${
      counts.last / counts.head}x":${f"$flat%.2f"},"cells":[${
      cells.map(_._2).mkString(",")}]}""")
    spark.stop()
  }
}
