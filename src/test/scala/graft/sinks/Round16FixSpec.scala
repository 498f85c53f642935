package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions.col

/** Regression pins for the round-16 review findings. */
class Round16FixSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft-r16fix").toString + "/t"

  test("stats pruning survives a table path that needs URI encoding") {
    // input_file_name() yields percent-encoded URIs; manifests hold
    // decoded paths — a space in the table path must not silently
    // disable pruning (or flip commitIf disjointness to always-abort)
    val dir = java.nio.file.Files.createTempDirectory("graft enc oded")
    val path = dir.toString + "/my table"
    SnapshotStore.commit(
      spark.range(100).select(col("id"), (col("id") * 2).as("v"))
        .repartitionByRange(4, col("id")).sortWithinPartitions("id"),
      path, statsKey = Some("id"))
    // point read must open a strict subset of the manifest: correct
    // rows AND an actually-pruned plan (files opened < manifest size)
    val got = SnapshotStore.readWhere(spark, path, "id", 10, 12)
      .select("id").as[Long].collect().sorted
    assert(got.toSeq == Seq(10L, 11L, 12L))
    val opened = SnapshotStore.readWhere(spark, path, "id", 10, 12)
      .select(org.apache.spark.sql.functions.input_file_name()).distinct()
      .count()
    assert(opened < 4, s"pruning disabled on encoded path: opened $opened/4")
    // disjoint optimistic delete after a concurrent append: the stats
    // proof must still work (un-decoded paths made this always-abort)
    val v1 = SnapshotStore.latestVersion(path)
    SnapshotStore.commit(
      spark.range(1000, 1100).select(col("id"), (col("id") * 2).as("v"))
        .coalesce(1).sortWithinPartitions("id"),
      path, SaveMode.Append, statsKey = Some("id"))
    SnapshotStore.deleteCommitIf(spark, path,
      Seq(50L).toDF("id"), "id", expectedVersion = v1): Unit
    assert(SnapshotStore.read(spark, path)
      .filter(col("id") === 50L).isEmpty, "delete-by-key did not land")
  }

  test("dropColumn of the stats key: later merge by another key still works") {
    val path = fresh()
    SnapshotStore.commit(
      Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("id", "ts", "s"),
      path, statsKey = Some("ts"))
    SnapshotStore.dropColumn(spark, path, "ts")
    // merge by id with a disjoint key range: previously crashed with
    // AnalysisException (header still tracked the dropped "ts")
    val v = SnapshotStore.mergeCommit(spark, path,
      Seq((3L, "c")).toDF("id", "s"), "id")
    val rows = SnapshotStore.read(spark, path, Some(v))
      .select("id", "s").as[(Long, String)].collect().toSet
    assert(rows == Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("append column colliding with a renamed-away physical name is rejected") {
    val path = fresh()
    SnapshotStore.commit(Seq((1L, "x")).toDF("id", "a"), path)
    SnapshotStore.renameColumn(spark, path, "a", "b")
    // visible schema is (id, b) — a NEW column named "a" would land
    // under the physical name logical "b" reads from
    val e = intercept[IllegalArgumentException] {
      SnapshotStore.commit(Seq((2L, "y", "z")).toDF("id", "b", "a"),
        path, SaveMode.Append)
    }
    assert(e.getMessage.contains("collide"))
  }

  test("commitIf across a vacuumed base raises the retryable conflict, not an internal error") {
    val path = fresh()
    SnapshotStore.commit(Seq((1L, 1L)).toDF("id", "v"), path,
      statsKey = Some("id"))
    val base = SnapshotStore.latestVersion(path)
    (2 to 5).foreach { i =>
      SnapshotStore.commit(Seq((i.toLong, i.toLong)).toDF("id", "v"), path,
        SaveMode.Append, statsKey = Some("id"))
    }
    SnapshotStore.vacuum(path, keepVersions = 1)
    intercept[SnapshotStore.VersionConflictException] {
      SnapshotStore.deleteCommitIf(spark, path, Seq(999L).toDF("id"),
        "id", expectedVersion = base)
    }
  }

  test("CdcTail crash window: delta landed but unacked does not duplicate on restart") {
    val src = fresh(); val dst = fresh()
    SnapshotStore.commit(Seq((1L, "a")).toDF("id", "s"), src)
    SnapshotStore.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), src,
      SaveMode.Overwrite)
    // consume v1 (bootstrap) and v2 at CdcTail's maxStep = 1, landing
    // both, but CRASH before acking v2 (ack only v1) — the classic
    // sink-then-die window
    var landed = 0
    def drain(): Unit = {
      var more = true
      while (more)
        SnapshotStore.consumeChanges(spark, src, "r16fix", Some("id"),
          maxStep = 1L) match {
          case (Some(d), to) =>
            SnapshotStore.streamSink(dst)(d, to); landed += 1
            if (to == 1L) SnapshotStore.ackChanges(src, "r16fix", to)
            else more = false // v2 landed, ack LOST (simulated crash)
          case (None, _) => more = false
        }
    }
    drain()
    assert(landed == 2)
    // another fact commit arrives, then the consumer restarts
    SnapshotStore.commit(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s"), src,
      SaveMode.Overwrite)
    var more = true
    while (more)
      SnapshotStore.consumeChanges(spark, src, "r16fix", Some("id"),
        maxStep = 1L) match {
        case (Some(d), to) =>
          SnapshotStore.streamSink(dst)(d, to)
          SnapshotStore.ackChanges(src, "r16fix", to)
        case (None, _) => more = false
      }
    // exactly one row per insert — the re-delivered v2 delta was
    // skipped by the batch-id rule, v3's insert landed once
    val rows = SnapshotStore.read(spark, dst)
      .select("id", "s", "_change").as[(Long, String, String)]
      .collect().toSeq
    assert(rows.sortBy(_._1) ==
      Seq((1L, "a", "insert"), (2L, "b", "insert"), (3L, "c", "insert")),
      s"duplicated or lost CDC rows: $rows")
  }
}
