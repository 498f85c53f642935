package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Model-based TORTURE test of the whole r13–r17 table layer: a long
  * deterministic interleaving of every mutating operation — append,
  * overwrite, mergeCommit, deleteCommit, deleteVectorCommit,
  * mergeInto, compact (plain/z-order), rename/drop column, vacuum,
  * stream batches — is replayed against a driver-side MODEL (a plain
  * Map), and after EVERY step the live table must equal the model
  * exactly. Keyed CDC between consecutive versions is cross-checked
  * against the model diff, so the changelog layer is gated by the
  * same walk. Any interaction bug between the manifest chain, stats
  * checkpoints, schema sidecar, deletion vectors, and column mapping
  * surfaces as a first-class equality failure with the step number. */
class TableTortureSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft-torture").toString + "/t"

  test("29-step interleaving of every mutating op matches the model at every step") {
    tortureWalk()
  }

  test("the same walk through a NO-RENAME object-store-semantics LogStore (r18)") {
    // the metadata layer must survive a store with no atomic-rename
    // primitive: publishes become direct PUTs (all-or-nothing by the
    // store contract), locks become exclusive creates, and the DV-GC
    // partial shrink is skipped. Any rename attempt fails the walk.
    LogStore.overrideStore = Some(ObjectStoreSimLogStore)
    try tortureWalk()
    finally LogStore.overrideStore = None
  }

  private def tortureWalk(): Unit = {
    val path = fresh()
    // model: id -> v (single value column keeps the model exact)
    var model = Map.empty[Long, Long]
    var prevModel = Map.empty[Long, Long]
    var step = 0
    var lastVersion = 0L
    var valName = "v" // tracks renames

    def df(rows: Seq[(Long, Long)]) = rows.toDF("id", valName)

    def check(op: String): Unit = {
      step += 1
      val got = SnapshotStore.read(spark, path)
        .select(col("id"), col(valName).as("v"))
        .as[(Long, Long)].collect().toMap
      assert(got == model,
        s"step $step ($op): table ${got.toSeq.sorted.take(8)}... != " +
          s"model ${model.toSeq.sorted.take(8)}...")
      // keyed CDC of the step's single commit must equal the MODEL
      // diff (identical rewrites — compaction, rename — suppress to
      // an empty changelog)
      val v = SnapshotStore.latestVersion(path)
      if (v == lastVersion + 1 && lastVersion >= 1 &&
          SnapshotStore.versions(path).contains(lastVersion)) {
        val cdc = SnapshotStore
          .readChanges(spark, path, lastVersion, v, Some("id"))
          .select(col("id"), col("_change")).as[(Long, String)]
          .collect().toSet
        val exp =
          (model.keySet -- prevModel.keySet).map(k => (k, "insert")) ++
          (prevModel.keySet -- model.keySet).map(k => (k, "delete")) ++
          model.keySet.intersect(prevModel.keySet)
            .filter(k => model(k) != prevModel(k)).map(k => (k, "update"))
        assert(cdc == exp,
          s"step $step ($op) CDC v$lastVersion->v$v: $cdc != $exp")
      }
      prevModel = model
      lastVersion = v
    }

    def append(rows: (Long, Long)*): Unit = {
      SnapshotStore.commit(df(rows), path, SaveMode.Append)
      model ++= rows; check(s"append ${rows.size}")
    }
    def overwrite(rows: (Long, Long)*): Unit = {
      SnapshotStore.commit(df(rows), path, SaveMode.Overwrite,
        statsKey = Some("id"))
      model = rows.toMap; check("overwrite")
    }
    def merge(rows: (Long, Long)*): Unit = {
      SnapshotStore.mergeCommit(spark, path, df(rows), "id")
      model ++= rows; check(s"merge ${rows.size}")
    }
    def del(keys: Long*): Unit = {
      SnapshotStore.deleteCommit(spark, path, keys.toDF("id"), "id")
      model --= keys; check(s"delete ${keys.size}")
    }
    def dv(keys: Long*): Unit = {
      SnapshotStore.deleteVectorCommit(spark, path, keys.toDF("id"), "id")
      model --= keys; check(s"dv ${keys.size}")
    }

    overwrite((1 to 40).map(i => (i.toLong, i * 10L)): _*)
    append((41L, 410L), (42L, 420L))
    merge((1L, -1L), (41L, -41L), (100L, 1000L))
    dv(2L, 3L)
    append((43L, 430L))
    del(4L, 100L)
    // mask a row, then MERGE INTO over the same key range: the masked
    // row must not resurrect, the clause ladder applies to live rows
    dv(5L)
    SnapshotStore.mergeInto(spark, path,
      Seq((5L, 55L), (6L, 66L), (200L, 2000L)).toDF("id", valName), "id",
      matched = Seq(
        SnapshotStore.MergeUpdate(Map(valName -> s"s.$valName"),
          Some(s"t.$valName < 100")),
        SnapshotStore.MergeDelete(Some("t.id = 7"))),
      notMatched = Some(SnapshotStore.MergeInsert(None)))
    // model: 5 is masked (not matched) -> INSERT 55; 6 matched v=60<100
    // -> update 66; 200 not matched -> insert
    model ++= Seq((5L, 55L), (6L, 66L), (200L, 2000L)); check("mergeInto")
    // second ladder: id 7 (v=70) first clause (70<100) wins over the
    // delete clause — first-match order enforced mid-torture
    SnapshotStore.mergeInto(spark, path,
      Seq((7L, 77L)).toDF("id", valName), "id",
      matched = Seq(
        SnapshotStore.MergeUpdate(Map(valName -> s"s.$valName"),
          Some(s"t.$valName < 100")),
        SnapshotStore.MergeDelete(None)))
    model += ((7L, 77L)); check("mergeInto order")

    SnapshotStore.compact(spark, path, targetBytes = 1L << 20,
      sortCols = Seq("id"))
    check("compact sorted")
    merge((8L, -8L), (300L, 3000L))
    dv(9L, 300L)
    append((44L, 440L))

    // column rename mid-history: later ops use the NEW logical name
    SnapshotStore.renameColumn(spark, path, valName, "val")
    valName = "val"; check("rename")
    merge((10L, -10L))
    dv(11L)
    del(12L)
    SnapshotStore.mergeInto(spark, path,
      Seq((13L, 131L), (400L, 4000L)).toDF("id", valName), "id",
      matched = Seq(SnapshotStore.MergeUpdate(
        Map(valName -> s"s.$valName + t.$valName"), None)),
      notMatched = Some(SnapshotStore.MergeInsert(Some("s.id % 2 = 0"))))
    model += ((13L, 131L + 130L)); model += ((400L, 4000L))
    check("mergeInto after rename")

    // z-order compaction (multi-dim needs 2 cols: id + val)
    SnapshotStore.compactZOrdered(spark, path, Seq("id", valName),
      targetBytes = 1L << 20)
    check("zorder")
    // vacuum under a live delta chain, then keep mutating
    SnapshotStore.vacuum(path, keepVersions = 3)
    check("vacuum")
    append((45L, 450L))
    dv(45L)
    merge((45L, 451L)) // re-insert a previously DV-masked key
    check("reinsert masked key")
    // RESTORE mid-walk (r18): mutate past a saved version, roll back —
    // the model snaps back and the keyed-CDC check gates the rollback
    // diff (dropped merge file, resurrected DV mask) automatically
    val (savedModel, savedV) = (model, SnapshotStore.latestVersion(path))
    merge((300L, 3001L))
    dv(10L)
    SnapshotStore.restore(spark, path, savedV)
    model = savedModel; check("restore")

    // stream batches land exactly once
    SnapshotStore.streamSink(path)(df(Seq((46L, 460L))), 900L)
    model += ((46L, 460L)); check("stream batch")
    SnapshotStore.streamSink(path)(df(Seq((46L, 460L))), 900L) // replay
    check("stream replay skipped")
    // PARTITIONED overwrite mid-walk (r18): same rows re-clustered by
    // the value column — keyed CDC must suppress the identical
    // rewrite, later appends re-cluster, readWhereEq answers
    SnapshotStore.commit(df(model.toSeq), path, SaveMode.Overwrite,
      statsKey = Some("id"), partitionBy = Seq(valName))
    check("partitioned overwrite")
    append((47L, 470L))
    locally {
      val v470 = SnapshotStore
        .readWhereEq(spark, path, valName, "470")
        .select(col("id")).as[Long].collect().toSet
      assert(v470 == model.filter(_._2 == 470L).keySet,
        s"readWhereEq after partitioned overwrite: $v470")
    }
    del((1 to 20).map(_.toLong): _*)
    dv((21 to 30).map(_.toLong): _*)
    SnapshotStore.compact(spark, path, targetBytes = 1L << 20,
      sortCols = Seq("id"))
    check("final compact")
    assert(SnapshotStore.read(spark, path).count() == model.size)
    info(s"torture: $step steps, final version $lastVersion, " +
      s"${model.size} live rows")
  }
}
