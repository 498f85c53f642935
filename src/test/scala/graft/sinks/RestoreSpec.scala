package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** r18 RESTORE: republish an old version as the new head — metadata-
  * only commit, deletion-vector reset (rolled-back masks resurrect,
  * pre-restore time travel keeps its own masks), exact keyed CDC of
  * the rollback, vacuum/retention interplay, SQL statement form. */
class RestoreSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft-restore").toString + "/t"

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").as[Long].collect().toSet

  test("restore republishes the old state; zero data rewritten; head no-op") {
    val path = fresh()
    SnapshotStore.commit(
      spark.range(0, 100).select(col("id"), (col("id") * 2).as("v"))
        .repartitionByRange(4, col("id")).sortWithinPartitions("id"),
      path, statsKey = Some("id"))                                 // v1
    SnapshotStore.commit(Seq((500L, 1L)).toDF("id", "v"), path,
      SaveMode.Append)                                             // v2
    SnapshotStore.deleteCommit(spark, path, Seq(7L).toDF("id"), "id") // v3
    val dataFilesBefore = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(path, "data")).count(_.getName.endsWith(".parquet"))
    }
    val nv = SnapshotStore.restore(spark, path, 1L)                // v4
    assert(nv == 4L)
    // restored state ≡ time travel to v1, file-for-file
    assert(ids(SnapshotStore.read(spark, path)) ==
      ids(SnapshotStore.read(spark, path, Some(1L))))
    assert(SnapshotStore.read(spark, path).count() == 100)
    assert(SnapshotStore.read(spark, path).inputFiles.toSet ==
      SnapshotStore.read(spark, path, Some(1L)).inputFiles.toSet)
    // metadata-only: no new data files were written
    val dataFilesAfter = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(path, "data")).count(_.getName.endsWith(".parquet"))
    }
    assert(dataFilesAfter == dataFilesBefore)
    // time travel to the rolled-back versions still works (retention
    // permitting)
    assert(ids(SnapshotStore.read(spark, path, Some(3L))) ==
      ((0L until 100L).toSet - 7L) + 500L)
    // restoring the head is a no-op
    assert(SnapshotStore.restore(spark, path, 4L) == 4L)
    // stats pruning still works on the restored head (consolidated
    // chain stats)
    val w = SnapshotStore.readWhere(spark, path, "id", 10L, 15L)
    assert(ids(w) == (10L to 15L).toSet)
    assert(w.inputFiles.length < SnapshotStore.read(spark, path)
      .inputFiles.length)
  }

  test("deletion-vector reset: rolled-back masks resurrect; pre-restore reads keep theirs; new masks work") {
    val path = fresh()
    SnapshotStore.commit(
      spark.range(0, 100).select(col("id"), (col("id") * 2).as("v"))
        .repartitionByRange(4, col("id")).sortWithinPartitions("id"),
      path, statsKey = Some("id"))                                   // v1
    SnapshotStore.deleteVectorCommit(spark, path, Seq(7L, 8L).toDF("id"),
      "id")                                                          // v2
    assert(!ids(SnapshotStore.read(spark, path)).contains(7L))
    SnapshotStore.restore(spark, path, 1L)                           // v3
    // the masks rolled back: rows resurrect at the new head
    assert(ids(SnapshotStore.read(spark, path)).contains(7L))
    assert(SnapshotStore.read(spark, path).count() == 100)
    // pre-restore time travel still sees v2's masks
    assert(!ids(SnapshotStore.read(spark, path, Some(2L))).contains(7L))
    // keyed CDC across the restore: exactly the resurrections
    val cdc = SnapshotStore.readChanges(spark, path, 2, 3, Some("id"))
      .select("id", "_change").as[(Long, String)].collect().toSet
    assert(cdc == Set((7L, "insert"), (8L, "insert")), cdc.toString)
    // masks AFTER the restore apply normally
    SnapshotStore.deleteVectorCommit(spark, path, Seq(9L).toDF("id"), "id")
    assert(!ids(SnapshotStore.read(spark, path)).contains(9L))
    assert(SnapshotStore.read(spark, path).count() == 99)
    // and a restore TO a masked version carries its masks
    SnapshotStore.restore(spark, path, 2L)                           // v5
    assert(SnapshotStore.read(spark, path).count() == 98)
    assert(!ids(SnapshotStore.read(spark, path)).contains(7L))
    assert(ids(SnapshotStore.read(spark, path)).contains(9L),
      "the v4 mask was rolled back by restoring v2")
  }

  test("restore CDC classifies a mixed rollback: reverted updates, dropped appends, resurrected deletes") {
    val path = fresh()
    SnapshotStore.commit(
      Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v"), path,
      statsKey = Some("id"))                                         // v1
    SnapshotStore.mergeCommit(spark, path,
      Seq((2L, 200L), (4L, 40L)).toDF("id", "v"), "id")              // v2
    SnapshotStore.deleteCommit(spark, path, Seq(3L).toDF("id"), "id") // v3
    SnapshotStore.restore(spark, path, 1L)                           // v4
    val cdc = SnapshotStore.readChanges(spark, path, 3, 4, Some("id"))
      .select("id", "v", "_change").as[(Long, Long, String)]
      .collect().toSet
    assert(cdc == Set(
      (2L, 20L, "update"),  // reverted to the old payload
      (4L, 40L, "delete"),  // rolled-back insert
      (3L, 30L, "insert")), // rolled-back delete
      cdc.toString)
    assert(SnapshotStore.read(spark, path).select("id", "v")
      .as[(Long, Long)].collect().toSet ==
      Set((1L, 10L), (2L, 20L), (3L, 30L)))
  }

  test("vacuum after restore: retention from the new head; expiring reset marker migrates") {
    val path = fresh()
    SnapshotStore.commit(
      spark.range(0, 50).select(col("id"), (col("id") * 2).as("v"))
        .repartitionByRange(2, col("id")).sortWithinPartitions("id"),
      path, statsKey = Some("id"))                                   // v1
    SnapshotStore.deleteVectorCommit(spark, path, Seq(5L).toDF("id"),
      "id")                                                          // v2
    SnapshotStore.restore(spark, path, 1L)                           // v3 (reset)
    SnapshotStore.commit(Seq((200L, 1L)).toDF("id", "v"), path,
      SaveMode.Append)                                               // v4
    SnapshotStore.commit(Seq((201L, 1L)).toDF("id", "v"), path,
      SaveMode.Append)                                               // v5
    // retention expires v1..v3 INCLUDING the reset-marker version: the
    // visibility cut must survive (row 5 stays resurrected)
    SnapshotStore.vacuum(spark, path, keepVersions = 2)
    assert(SnapshotStore.read(spark, path).count() == 52)
    assert(ids(SnapshotStore.read(spark, path)).contains(5L),
      "an expired reset marker must not let the rolled-back mask return")
    assert(SnapshotStore.read(spark, path, Some(4L)).count() == 51)
  }

  test("SQL statement form + guards") {
    val path = fresh()
    SnapshotStore.commit(Seq((1L, "a")).toDF("id", "s"), path)        // v1
    SnapshotStore.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"),
      path)                                                           // v2
    val nv = graft.GraftSql.restore(spark,
      s"RESTORE TABLE '$path' TO VERSION AS OF 1;")
    assert(nv == 3L && SnapshotStore.read(spark, path).count() == 1)
    intercept[IllegalArgumentException] {
      graft.GraftSql.restore(spark, "RESTORE nope")
    }
    intercept[IllegalArgumentException] {
      SnapshotStore.restore(spark, path, 99L) // not a retained version
    }
  }
}
