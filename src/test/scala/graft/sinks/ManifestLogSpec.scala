package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** The r17 O(delta) manifest log: appends/merges/deletes publish DELTA
  * manifests (what changed, not the file list), every
  * `manifestCheckpointInterval`-th carry materializes a FULL
  * checkpoint, vacuum materializes the retention boundary, and every
  * read path (snapshot, time travel, CDC, pruning) resolves the chain
  * to byte-identical answers. */
class ManifestLogSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft-mlog").toString + "/t"

  private def manifestText(path: String, v: Long): String =
    new String(java.nio.file.Files.readAllBytes(
      new java.io.File(new java.io.File(path, "_snapshots"),
        f"v$v%08d.manifest").toPath), "UTF-8")

  test("appends publish O(new files) delta manifests; interval materializes a full checkpoint") {
    val path = fresh()
    val old = SnapshotStore.manifestCheckpointInterval
    SnapshotStore.manifestCheckpointInterval = 4
    try {
      SnapshotStore.commit(Seq((1L, "a")).toDF("id", "s"), path) // v1 FULL
      assert(!manifestText(path, 1).contains("#base="))
      (2 to 4).foreach { i => // v2..v4: depths 1..3 → deltas
        SnapshotStore.commit(Seq((i.toLong, s"x$i")).toDF("id", "s"), path,
          SaveMode.Append)
        val m = manifestText(path, i.toLong)
        assert(m.contains(s"#base=${i - 1}") && m.contains("+"),
          s"v$i must be a delta manifest:\n$m")
        // the delta lists ONLY this commit's files, not the table
        assert(m.linesIterator.count(_.startsWith("+")) ==
          SnapshotStore.history(spark, path).filter(col("version") === i)
            .select("n_files").as[Int].head() -
          SnapshotStore.history(spark, path)
            .filter(col("version") === (i - 1))
            .select("n_files").as[Int].head())
      }
      // v5 hits the interval: FULL checkpoint with the whole list
      SnapshotStore.commit(Seq((5L, "x5")).toDF("id", "s"), path,
        SaveMode.Append)
      val m5 = manifestText(path, 5)
      assert(!m5.contains("#base=") && m5.contains("#n="),
        s"v5 must be a full checkpoint:\n$m5")
      // every version reads back exactly (chain resolution ≡ replay)
      (1 to 5).foreach { v =>
        assert(SnapshotStore.read(spark, path, Some(v.toLong))
          .select("id").as[Long].collect().sorted.toSeq ==
          (1 to v).map(_.toLong))
      }
    } finally SnapshotStore.manifestCheckpointInterval = old
  }

  test("merge/delete publish drop+add deltas; CDC and pruning resolve the chain exactly") {
    val path = fresh()
    val df = spark.range(0, 100).select(col("id"), (col("id") * 2).as("v"))
      .repartitionByRange(4, col("id")).sortWithinPartitions("id")
    SnapshotStore.commit(df, path, statsKey = Some("id"))
    SnapshotStore.mergeCommit(spark, path, Seq((7L, -1L)).toDF("id", "v"),
      "id") // v2: touches 1 of 4 files
    val m2 = manifestText(path, 2)
    assert(m2.contains("#base=1") &&
      m2.linesIterator.count(_.startsWith("-")) == 1,
      s"point merge must drop exactly the touched file:\n$m2")
    SnapshotStore.deleteCommit(spark, path, Seq(99L).toDF("id"), "id") // v3
    assert(manifestText(path, 3).linesIterator.count(_.startsWith("-")) == 1)
    // keyed CDC across the delta chain (the O(delta) fast path)
    val cdc = SnapshotStore.readChanges(spark, path, 1, 3, Some("id"))
      .select("id", "_change").as[(Long, String)].collect().toSet
    assert(cdc == Set((7L, "update"), (99L, "delete")))
    // pruning still plans from chain-resolved stats
    val w = SnapshotStore.readWhere(spark, path, "id", 7, 7)
    assert(w.select("v").as[Long].head() == -1L)
    assert(w.inputFiles.length <= 2)
    assert(SnapshotStore.read(spark, path).count() == 99)
  }

  test("vacuum across a delta chain materializes the boundary; time travel + CDC + stats survive") {
    val path = fresh()
    val old = SnapshotStore.manifestCheckpointInterval
    SnapshotStore.manifestCheckpointInterval = 100 // force a long chain
    try {
      SnapshotStore.commit(
        spark.range(0, 64).select(col("id"), (col("id") * 2).as("v"))
          .repartitionByRange(4, col("id")).sortWithinPartitions("id"),
        path, statsKey = Some("id"))
      (1 to 4).foreach { i =>
        SnapshotStore.commit(
          Seq((100L + i, 7L)).toDF("id", "v"), path, SaveMode.Append,
          statsKey = Some("id")) // v2..v5: all deltas
      }
      assert(manifestText(path, 4).contains("#base=3"))
      SnapshotStore.vacuum(path, keepVersions = 2) // keeps v4, v5
      // v4 (the boundary) was materialized: FULL manifest, same rows
      assert(!manifestText(path, 4).contains("#base="))
      assert(SnapshotStore.read(spark, path, Some(4L)).count() == 67)
      // v5 still resolves through the materialized v4
      assert(SnapshotStore.read(spark, path).count() == 68)
      // CDC across the retained range
      assert(SnapshotStore.readChanges(spark, path, 4, 5, Some("id"))
        .select("id").as[Long].collect().toSeq == Seq(104L))
      // stats consolidated at the boundary: pruning still plans
      val w = SnapshotStore.readWhere(spark, path, "id", 10, 11)
      assert(w.count() == 2 && w.inputFiles.length <= 2,
        s"opened ${w.inputFiles.length} files — boundary stats lost")
      // pre-boundary versions are gone
      intercept[IllegalArgumentException] {
        SnapshotStore.read(spark, path, Some(2L))
      }
    } finally SnapshotStore.manifestCheckpointInterval = old
  }

  test("untracked carry commits keep the pruning layer alive (header carried, ranges degrade per-file)") {
    val path = fresh()
    val df = spark.range(0, 100).select(col("id"), (col("id") * 2).as("v"))
      .repartitionByRange(4, col("id")).sortWithinPartitions("id")
    SnapshotStore.commit(df, path, statsKey = Some("id"))
    // a plain append WITHOUT statsKey (the streamSink shape)
    SnapshotStore.commit(Seq((500L, 1L)).toDF("id", "v"), path,
      SaveMode.Append)
    // the tracked key survives: a later merge still prunes by it
    val before = SnapshotStore.read(spark, path).inputFiles.toSet
    SnapshotStore.mergeCommit(spark, path, Seq((7L, -1L)).toDF("id", "v"),
      "id")
    val after = SnapshotStore.read(spark, path).inputFiles.toSet
    // the untracked file (no range) counts as touched — conservative —
    // but the three disjoint base files are carried by reference
    assert(after.intersect(before).size >= 3,
      "chain stats lost: merge rewrote provably-disjoint files")
    assert(SnapshotStore.read(spark, path)
      .filter(col("id") === 7).select("v").as[Long].head() == -1L)
  }
}
