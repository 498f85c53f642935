package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** r18 object-store LogStore: the Hadoop-FileSystem store drives the
  * whole table layer on a scheme-qualified (`file:`) root — manifest
  * publishes via FileContext rename, header probes via fs.open,
  * listing/deleting via FileSystem — plus direct unit checks of the
  * store primitives, including the no-rename (object-store) publish
  * strategy. */
class HadoopLogStoreSpec extends SparkSpec {
  import spark.implicits._

  private def freshUri(): String =
    "file:" + java.nio.file.Files.createTempDirectory("graft-hls")
      .toString + "/t"

  test("store primitives: atomic publish, exclusive create, list/copy/rename") {
    val st = HadoopLogStore.forPath("file:/tmp")
    assert(st.renameSupported)
    val dir = "file:" + java.nio.file.Files
      .createTempDirectory("graft-hls-prim").toString
    val f = st.child(dir, "a.txt")
    st.writeAtomic(f, "one")
    assert(st.exists(f) && st.readString(f) == "one")
    st.writeAtomic(f, "two") // overwrite publish (the pointer pattern)
    assert(st.readString(f) == "two")
    assert(st.putIfAbsent(st.child(dir, "lock")))
    assert(!st.putIfAbsent(st.child(dir, "lock")), "second create must lose")
    st.copyFile(f, st.child(dir, "b.txt"))
    assert(st.readString(st.child(dir, "b.txt")) == "two")
    assert(st.rename(st.child(dir, "b.txt"), st.child(dir, "c.txt")))
    val names = st.list(dir).map(_.name).sorted
    assert(names == Seq("a.txt", "c.txt", "lock"), names.toString)
    assert(st.length(f) == 3L)

    // the object-store strategy: publishes still land whole without
    // any rename call
    val noRen = new HadoopLogStore(
      spark.sessionState.newHadoopConf(), renameSupported = false)
    val g = noRen.child(dir, "put.txt")
    noRen.writeAtomic(g, "payload")
    assert(noRen.readString(g) == "payload")
    assert(!noRen.rename(g, noRen.child(dir, "x")), "no rename primitive")
    assert(noRen.list(dir).exists(_.name == "put.txt"))
  }

  test("full table-layer walk on a file:-scheme root through the Hadoop store") {
    val path = freshUri()
    // v1: seeded, range-clustered, stats-tracked
    SnapshotStore.commit(
      spark.range(0, 100).select(col("id"), (col("id") * 2).as("v"))
        .repartitionByRange(4, col("id")).sortWithinPartitions("id"),
      path, statsKey = Some("id"))
    assert(SnapshotStore.latestVersion(path) == 1L)
    assert(SnapshotStore.read(spark, path).count() == 100)

    // v2: append; v3: keyed merge; v4: deletion-vector mask
    SnapshotStore.commit(Seq((200L, 1L), (201L, 1L)).toDF("id", "v"),
      path, SaveMode.Append)
    SnapshotStore.mergeCommit(spark, path,
      Seq((1L, -1L), (300L, 3L)).toDF("id", "v"), "id")
    SnapshotStore.deleteVectorCommit(spark, path, Seq(7L).toDF("id"), "id")
    assert(SnapshotStore.latestVersion(path) == 4L)
    assert(SnapshotStore.read(spark, path).count() == 102)
    assert(SnapshotStore.read(spark, path).filter(col("id") === 7).isEmpty)
    // time travel: pre-mask version still shows the row
    assert(SnapshotStore.read(spark, path, Some(3L))
      .filter(col("id") === 7).count() == 1)

    // keyed CDC across the DV commit
    val cdc = SnapshotStore.readChanges(spark, path, 3, 4, Some("id"))
      .select("id", "_change").as[(Long, String)].collect().toSet
    assert(cdc == Set((7L, "delete")), cdc.toString)

    // stats-pruned read: the range slice matches a plain filter
    val pruned = SnapshotStore.readWhere(spark, path, "id", 10L, 20L)
      .select("id").as[Long].collect().toSet
    assert(pruned == (10L to 20L).toSet, pruned.toString)

    // compact (DV materializes), vacuum, history
    SnapshotStore.compact(spark, path, targetBytes = 1L << 20,
      sortCols = Seq("id"))
    assert(SnapshotStore.read(spark, path).count() == 102)
    SnapshotStore.vacuum(spark, path, keepVersions = 2)
    assert(SnapshotStore.read(spark, path).count() == 102)
    val hist = SnapshotStore.history(spark, path)
      .select("version").as[Long].collect().sorted
    assert(hist.last == 5L && hist.length == 2, hist.mkString(","))

    // constraints gate through the store too
    SnapshotStore.addConstraint(spark, path, "v_not_null", "v IS NOT NULL")
    intercept[SnapshotStore.ConstraintViolationException] {
      SnapshotStore.commit(
        Seq((900L, null.asInstanceOf[java.lang.Long])).toDF("id", "v"),
        path, SaveMode.Append)
    }
    assert(SnapshotStore.read(spark, path).count() == 102,
      "rejected batch must leave the table untouched")
  }
}
