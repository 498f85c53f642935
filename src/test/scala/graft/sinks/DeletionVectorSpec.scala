package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** r17 deletion vectors: a point delete MARKS rows in a (file,
  * row_index) sidecar instead of rewriting files — zero data files
  * written, every read path masks, versioned time travel, keyed CDC
  * emits the deletes, rewrites materialize, vacuum consolidates. */
class DeletionVectorSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft-dv").toString + "/t"

  private def dataFiles(path: String): Set[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else Seq(f)
    walk(new java.io.File(path, "data"))
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).toSet
  }

  private def seed(path: String): Unit =
    SnapshotStore.commit(
      spark.range(0, 100).select(col("id"), (col("id") * 2).as("v"))
        .repartitionByRange(4, col("id")).sortWithinPartitions("id"),
      path, statsKey = Some("id"))

  test("1-key delete writes ZERO data files; reads mask; time travel keeps the row; CDC emits the delete") {
    val path = fresh()
    seed(path)
    val before = dataFiles(path)

    val v2 = SnapshotStore.deleteVectorCommit(spark, path, Seq(7L).toDF("id"),
      "id")
    assert(v2 == 2)
    assert(dataFiles(path) == before, "a DV delete must write no data files")
    // manifest unchanged (zero-change delta), row masked on every read
    assert(SnapshotStore.history(spark, path)
      .select("n_files").as[Int].collect().toSeq == Seq(4, 4))
    assert(SnapshotStore.read(spark, path).count() == 99)
    assert(SnapshotStore.read(spark, path).filter(col("id") === 7).isEmpty)
    assert(SnapshotStore.readWhere(spark, path, "id", 7, 7).isEmpty)
    // pinned reader / time travel: the pre-delete version keeps the row
    assert(SnapshotStore.read(spark, path, Some(1L)).count() == 100)
    // keyed CDC: the masked row is a delete, nothing else changes
    assert(SnapshotStore.readChanges(spark, path, 1, 2, Some("id"))
      .select("id", "_change").as[(Long, String)].collect().toSeq ==
      Seq((7L, "delete")))
    // absent or already-masked keys are a version no-op
    assert(SnapshotStore.deleteVectorCommit(spark, path,
      Seq(7L).toDF("id"), "id") == 2)
    assert(SnapshotStore.deleteVectorCommit(spark, path,
      Seq(7000L).toDF("id"), "id") == 2)
    // a second DV delete stacks
    val v3 = SnapshotStore.deleteVectorCommit(spark, path,
      Seq(8L, 9L).toDF("id"), "id")
    assert(v3 == 3 && SnapshotStore.read(spark, path).count() == 97)
    assert(SnapshotStore.readChanges(spark, path, 2, 3, Some("id"))
      .select("id").as[Long].collect().sorted.toSeq == Seq(8L, 9L))
  }

  test("rewrites never resurrect masked rows; compaction materializes tombstones") {
    val path = fresh()
    seed(path)
    SnapshotStore.deleteVectorCommit(spark, path, Seq(7L).toDF("id"), "id")
    // a merge touching the masked row's FILE must not bring it back
    SnapshotStore.mergeCommit(spark, path, Seq((3L, -1L)).toDF("id", "v"),
      "id")
    assert(SnapshotStore.read(spark, path).filter(col("id") === 7).isEmpty)
    assert(SnapshotStore.read(spark, path)
      .filter(col("id") === 3).select("v").as[Long].head() == -1L)
    // deleteCommit (the rewrite path) coexists
    SnapshotStore.deleteCommit(spark, path, Seq(99L).toDF("id"), "id")
    assert(SnapshotStore.read(spark, path).count() == 98)
    // compaction reads masked rows out of existence: the new files
    // physically lack id 7 (raw read, no mask applied)
    val vC = SnapshotStore.compact(spark, path, targetBytes = 1L << 30)
    // inputFiles includes the tombstone sidecar's scan — the DATA
    // files are the ones under data/
    val raw = spark.read.parquet(
      SnapshotStore.read(spark, path, Some(vC)).inputFiles
        .filter(_.contains("/data/")): _*)
    assert(raw.filter(col("id") === 7).isEmpty,
      "compaction must materialize deletion vectors")
    assert(SnapshotStore.read(spark, path).count() == 98)
    // keyed CDC across the compaction: every surviving row is an
    // identical rewrite (suppressed); the masked row was dead on BOTH
    // sides, so the changelog is exactly the -1 update vs v1
    val cdc = SnapshotStore.readChanges(spark, path, 2, vC, Some("id"))
      .select("id", "_change").as[(Long, String)].collect().toSet
    assert(cdc == Set((3L, "update"), (99L, "delete")))
  }

  test("vacuum consolidates tombstones into the retention boundary") {
    val path = fresh()
    seed(path)                                                       // v1
    SnapshotStore.deleteVectorCommit(spark, path, Seq(7L).toDF("id"), "id") // v2
    SnapshotStore.commit(Seq((200L, 1L)).toDF("id", "v"), path,
      SaveMode.Append)                                               // v3
    SnapshotStore.commit(Seq((201L, 1L)).toDF("id", "v"), path,
      SaveMode.Append)                                               // v4
    SnapshotStore.vacuum(path, keepVersions = 2) // keeps v3, v4
    // the v2 tombstone survived retention: still masked at both
    // retained versions
    assert(SnapshotStore.read(spark, path).filter(col("id") === 7).isEmpty)
    assert(SnapshotStore.read(spark, path, Some(3L))
      .filter(col("id") === 7).isEmpty)
    assert(SnapshotStore.read(spark, path).count() == 101)
    // and the changelog between retained versions is clean
    assert(SnapshotStore.readChanges(spark, path, 4, 4, Some("id"))
      .count() == 0)
  }

  test("vacuum(spark) GC retires tombstones whose files were rewritten away (r17)") {
    val path = fresh()
    seed(path)                                                        // v1
    SnapshotStore.deleteVectorCommit(spark, path, Seq(7L).toDF("id"),
      "id")                                                           // v2
    SnapshotStore.compact(spark, path, targetBytes = 1L << 30)       // v3
    SnapshotStore.commit(Seq((500L, 1L)).toDF("id", "v"), path,
      SaveMode.Append)                                               // v4
    SnapshotStore.deleteVectorCommit(spark, path, Seq(500L).toDF("id"),
      "id")                                                           // v5
    // retention keeps v3..v5: the v2 tombstone's file was compacted
    // away (inert), the v5 tombstone masks a live file (must survive)
    SnapshotStore.vacuum(spark, path, keepVersions = 3)
    val snap = new java.io.File(path, "_snapshots")
    def dvDirs = Option(snap.listFiles()).toSeq.flatten
      .filter(_.getName.endsWith(".dvpq")).map(_.getName).sorted
    assert(dvDirs == Seq("v00000005.dvpq"),
      s"inert tombstones must be GC'd, live ones kept: $dvDirs")
    assert(SnapshotStore.read(spark, path).count() == 99,
      "GC must not change what reads see")
    assert(SnapshotStore.read(spark, path)
      .filter(col("id") === 500).isEmpty)
    assert(SnapshotStore.read(spark, path, Some(4L))
      .filter(col("id") === 500).count() == 1,
      "time travel before the masking version still shows the row")
  }

  test("DV GC swap is crash-safe: every intermediate state heals (r18)") {
    import java.io.File
    def cpDir(src: File, dst: File): Unit = {
      dst.mkdirs()
      Option(src.listFiles()).toSeq.flatten.filter(_.isFile).foreach { f =>
        java.nio.file.Files.copy(f.toPath, new File(dst, f.getName).toPath)
      }
    }
    def masked(path: String): Boolean =
      SnapshotStore.read(spark, path).filter(col("id") === 7).isEmpty

    // one table per fabricated crash state; heal = any lock
    // acquisition (recoverCommit) — the swap protocol is
    // write .gc → live→.old → .gc→live → drop .old
    def mk(): (String, File) = {
      val path = fresh()
      seed(path)
      SnapshotStore.deleteVectorCommit(spark, path, Seq(7L).toDF("id"), "id")
      val live = new File(new File(path, "_snapshots"), "v00000002.dvpq")
      assert(live.exists() && masked(path))
      (path, live)
    }

    // crash between rename-aside and promote: .old + .gc, live missing
    locally {
      val (path, live) = mk()
      val old = new File(live.getParentFile, live.getName + ".old")
      val gc = new File(live.getParentFile, live.getName + ".gc")
      cpDir(live, gc) // the completed GC rewrite (here: identical content)
      assert(live.renameTo(old))
      SnapshotStore.recoverCommit(path)
      assert(live.exists() && !old.exists() && !gc.exists() && masked(path))
    }
    // crash after promote, before dropping .old
    locally {
      val (path, live) = mk()
      val old = new File(live.getParentFile, live.getName + ".old")
      cpDir(live, old)
      SnapshotStore.recoverCommit(path)
      assert(live.exists() && !old.exists() && masked(path))
    }
    // crash before any rename: stale .gc next to the live dir
    locally {
      val (path, live) = mk()
      val gc = new File(live.getParentFile, live.getName + ".gc")
      cpDir(live, gc)
      SnapshotStore.recoverCommit(path)
      assert(live.exists() && !gc.exists() && masked(path))
    }
    // defensive: .old alone (protocol-unreachable) restores pre-GC
    locally {
      val (path, live) = mk()
      val old = new File(live.getParentFile, live.getName + ".old")
      assert(live.renameTo(old))
      SnapshotStore.recoverCommit(path)
      assert(live.exists() && !old.exists() && masked(path))
    }
    // and the real swap leaves no residue and keeps masks exact
    locally {
      val (path, live) = mk()
      SnapshotStore.compact(spark, path, targetBytes = 1L << 30)   // v3
      SnapshotStore.commit(Seq((500L, 1L)).toDF("id", "v"), path,
        SaveMode.Append)                                           // v4
      SnapshotStore.deleteVectorCommit(spark, path, Seq(500L).toDF("id"),
        "id")                                                      // v5
      SnapshotStore.vacuum(spark, path, keepVersions = 3)
      val names = Option(live.getParentFile.listFiles()).toSeq.flatten
        .map(_.getName).filter(_.contains(".dvpq"))
      assert(names.forall(n => n.endsWith(".dvpq")), s"residue: $names")
      assert(SnapshotStore.read(spark, path)
        .filter(col("id") === 500).isEmpty)
    }
  }

  test("streaming CDC source delivers DV deletes") {
    val path = fresh()
    seed(path)
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val ck = java.nio.file.Files.createTempDirectory("graft-dv-ck").toString
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true").option("key", "id")
      .load(path)
      .writeStream.option("checkpointLocation", ck)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized {
          seen ++= df.select("id", "_change").as[(Long, String)].collect()
        }
        ()
      }.start()
    try {
      q.processAllAvailable()
      assert(seen.size == 100) // bootstrap
      SnapshotStore.deleteVectorCommit(spark, path, Seq(42L).toDF("id"), "id")
      q.processAllAvailable()
      assert(seen.drop(100).toSeq == Seq((42L, "delete")))
    } finally q.stop()
  }
}
