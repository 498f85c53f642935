package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** r17 per-version schema sidecar: O(1) schema resolution (no
  * mergeSchema footer sweep at plan time), Delta-style append-time
  * type enforcement, per-version time-travel schemas, and the legacy
  * fallback. */
class SchemaSidecarSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft-sch").toString + "/t"

  private def sidecar(path: String, v: Long) =
    new java.io.File(new java.io.File(path, "_snapshots"),
      f"v$v%08d.schema")

  test("appends evolve the schema; every version reads under ITS sidecar; old rows null-fill") {
    val path = fresh()
    SnapshotStore.commit(Seq((1L, "a")).toDF("id", "s"), path)        // v1
    assert(sidecar(path, 1).exists())
    SnapshotStore.commit(Seq((2L, "b", 9L)).toDF("id", "s", "x"),
      path, SaveMode.Append)                                          // v2
    // v2's sidecar is the union; v1's is the original — time travel
    // presents each version's own shape
    assert(SnapshotStore.read(spark, path, Some(1L)).columns.toSeq ==
      Seq("id", "s"))
    assert(SnapshotStore.read(spark, path).columns.toSeq ==
      Seq("id", "s", "x"))
    val rows = SnapshotStore.read(spark, path)
      .select("id", "x").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSet
    assert(rows == Set((1L, -1L), (2L, 9L)), "old rows must null-fill x")
  }

  test("a type fork is rejected before any file is written; the table stays intact") {
    val path = fresh()
    SnapshotStore.commit(Seq((1L, 10L)).toDF("id", "v"), path)
    val dataBefore = Option(new java.io.File(path, "data").listFiles())
      .toSeq.flatten.map(_.getName).toSet
    val ex = intercept[SnapshotStore.SchemaMismatchException] {
      SnapshotStore.commit(Seq((2L, "oops")).toDF("id", "v"), path,
        SaveMode.Append)
    }
    assert(ex.getMessage.contains("'v'") &&
      ex.getMessage.contains("Overwrite"))
    assert(Option(new java.io.File(path, "data").listFiles())
      .toSeq.flatten.map(_.getName).toSet == dataBefore,
      "a rejected commit must write zero data files")
    assert(SnapshotStore.latestVersion(path) == 1)
    assert(SnapshotStore.read(spark, path).count() == 1)
    // ...and an Overwrite legitimately changes the type (reset)
    SnapshotStore.commit(Seq((2L, "ok")).toDF("id", "v"), path,
      SaveMode.Overwrite)
    assert(SnapshotStore.read(spark, path)
      .select("v").as[String].head() == "ok")
  }

  test("maintenance commits carry the sidecar: merge, DV delete, rename, compact") {
    val path = fresh()
    SnapshotStore.commit(
      spark.range(0, 50).select(col("id"), (col("id") * 2).as("v"))
        .repartitionByRange(4, col("id")).sortWithinPartitions("id"),
      path, statsKey = Some("id"))
    SnapshotStore.mergeCommit(spark, path, Seq((7L, -1L)).toDF("id", "v"),
      "id")
    assert(sidecar(path, 2).exists())
    SnapshotStore.deleteVectorCommit(spark, path, Seq(9L).toDF("id"), "id")
    assert(sidecar(path, 3).exists())
    SnapshotStore.renameColumn(spark, path, "v", "val")
    assert(sidecar(path, 4).exists(),
      "metadata commits must carry the schema sidecar")
    assert(SnapshotStore.read(spark, path).columns.toSeq ==
      Seq("id", "val"))
    SnapshotStore.compact(spark, path, targetBytes = 1L << 30)
    assert(SnapshotStore.read(spark, path).count() == 49)
    assert(SnapshotStore.read(spark, path)
      .filter(col("id") === 7).select("val").as[Long].head() == -1L)
  }

  test("legacy tables (no sidecar) fall back to footer inference; the next commit writes one") {
    val path = fresh()
    SnapshotStore.commit(Seq((1L, "a")).toDF("id", "s"), path)
    // simulate a pre-r17 table
    assert(sidecar(path, 1).delete())
    assert(SnapshotStore.read(spark, path).count() == 1)
    SnapshotStore.commit(Seq((2L, "b")).toDF("id", "s"), path,
      SaveMode.Append)
    assert(sidecar(path, 2).exists(),
      "first commit after upgrade must materialize the sidecar")
    assert(SnapshotStore.read(spark, path).count() == 2)
  }
}
