package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** r18 predicate row-level verbs: DELETE FROM … WHERE and
  * UPDATE … SET … WHERE — touched-file discovery, carried files by
  * reference, SQL null semantics, constraint validation on updates,
  * deletion-vector interplay, CDC classification, statement forms. */
class UpdateDeleteWhereSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft-udw").toString + "/t"

  private def seed(path: String): Unit =
    SnapshotStore.commit(
      spark.range(0, 100).select(col("id"), (col("id") * 2).as("v"),
        when(col("id") % 10 === 0, lit(null).cast("long"))
          .otherwise(col("id") % 3).as("tag"),
        format_string("s%02d", col("id") % 20).as("s"))
        .repartitionByRange(8, col("id")).sortWithinPartitions("id"),
      path, statsKey = Some("id"))

  test("deleteWhere: predicate rows leave, NULL keeps, untouched files carried, CDC classifies") {
    val path = fresh()
    seed(path)
    val before = SnapshotStore.read(spark, path).inputFiles.toSet
    assert(before.size > 1)
    // tag IS NULL rows (id % 10 == 0) must SURVIVE a tag = 1 delete —
    // SQL WHERE semantics: only TRUE deletes
    val v = SnapshotStore.deleteWhere(spark, path, "tag = 1 AND id < 50")
    assert(v == 2L)
    val live = SnapshotStore.read(spark, path)
    val ids = live.select("id").as[Long].collect().toSet
    val expectGone = (0L until 50L).filter(i => i % 10 != 0 && i % 3 == 1)
    assert(expectGone.forall(!ids.contains(_)))
    assert(ids.size == 100 - expectGone.size)
    assert((0L until 100L by 10L).forall(ids.contains),
      "NULL-tag rows must survive")
    // untouched files carried by reference
    assert(live.inputFiles.toSet.intersect(before).nonEmpty,
      "disjoint files must carry, not rewrite")
    // keyed CDC: exactly the deleted keys
    val cdc = SnapshotStore.readChanges(spark, path, 1, 2, Some("id"))
      .select("id", "_change").as[(Long, String)].collect().toSet
    assert(cdc == expectGone.map((_, "delete")).toSet)
    // no match → no new version
    assert(SnapshotStore.deleteWhere(spark, path, "id > 1000000") == 2L)
  }

  test("updateWhere: assignment applied with cast, carried files untouched, CDC updates, constraints enforced") {
    val path = fresh()
    seed(path)
    val before = SnapshotStore.read(spark, path).inputFiles.toSet
    val v = SnapshotStore.updateWhere(spark, path,
      Map("v" -> "v + 1000"), "tag = 2 AND id < 30")
    assert(v == 2L)
    val got = SnapshotStore.read(spark, path).select("id", "v")
      .as[(Long, Long)].collect().toMap
    (0L until 100L).foreach { i =>
      val hit = i % 10 != 0 && i % 3 == 2 && i < 30
      assert(got(i) == (if (hit) i * 2 + 1000 else i * 2), s"id $i")
    }
    assert(SnapshotStore.read(spark, path).inputFiles.toSet
      .intersect(before).nonEmpty)
    val cdc = SnapshotStore.readChanges(spark, path, 1, 2, Some("id"))
      .select("id", "_change").as[(Long, String)].collect().toSet
    val expectUpd = (0L until 30L)
      .filter(i => i % 10 != 0 && i % 3 == 2).map((_, "update")).toSet
    assert(cdc == expectUpd)

    // a CHECK constraint gates the UPDATED values (not rewrite-exempt)
    SnapshotStore.addConstraint(spark, path, "v_small", "v < 5000")
    intercept[SnapshotStore.ConstraintViolationException] {
      SnapshotStore.updateWhere(spark, path,
        Map("v" -> "v + 100000"), "id = 5")
    }
    assert(SnapshotStore.latestVersion(path) == 2L, "aborted untouched")
  }

  test("deletion-vector interplay: masked rows are not matchable and never resurrect") {
    val path = fresh()
    seed(path)
    SnapshotStore.deleteVectorCommit(spark, path, Seq(14L).toDF("id"), "id")
    // id 14 (tag 2) is masked: an update targeting tag=2 must not
    // touch it, and the rewrite must not resurrect it
    SnapshotStore.updateWhere(spark, path,
      Map("v" -> "v + 1000"), "tag = 2")
    val live = SnapshotStore.read(spark, path)
    assert(live.filter(col("id") === 14).isEmpty)
    assert(live.count() == 99)
    // and a predicate delete over the same class leaves it dead too
    SnapshotStore.deleteWhere(spark, path, "tag = 2 AND id < 10")
    assert(SnapshotStore.read(spark, path).filter(col("id") === 14).isEmpty)
  }

  test("SQL statement forms: UPDATE with CASE in SET, DELETE FROM, guards") {
    val path = fresh()
    seed(path)
    val v = graft.GraftSql.update(spark,
      s"""UPDATE '$path'
         |SET v = CASE WHEN v < 50 THEN v + 1 ELSE v END, tag = 9
         |WHERE id BETWEEN 10 AND 20""".stripMargin)
    assert(v == 2L)
    val got = SnapshotStore.read(spark, path)
      .filter(col("id").between(10, 20))
      .select("id", "v", "tag").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == (10L to 20L).map(i =>
      (i, if (i * 2 < 50) i * 2 + 1 else i * 2, 9L)).toSet)
    val v2 = graft.GraftSql.delete(spark,
      s"DELETE FROM '$path' WHERE tag = 9;")
    assert(v2 == 3L)
    assert(SnapshotStore.read(spark, path)
      .filter(col("id").between(10, 20)).isEmpty)
    intercept[IllegalArgumentException] {
      graft.GraftSql.update(spark, s"UPDATE '$path' SET v = 1") // no WHERE
    }
    intercept[IllegalArgumentException] {
      graft.GraftSql.delete(spark, "DELETE EVERYTHING")
    }
  }
}
