package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Materialized aggregate views: CDC-incremental refresh equals full
  * recompute, is idempotent when current, and survives the
  * crash-between-commit-and-ack window via the batch-id rule. */
class MaterializedViewSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft-mv").toString + "/t"

  private def recompute(base: String): Set[(String, Long, Long)] =
    SnapshotStore.read(spark, base).groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
      .as[(String, Long, Long)].collect().toSet

  private def viewRows(view: String): Set[(String, Long, Long)] =
    SnapshotStore.read(spark, view)
      .as[(String, Long, Long)].collect().toSet

  test("create + incremental refresh == full recompute; no-change refresh is a no-op") {
    val base = fresh(); val view = fresh()
    SnapshotStore.commit(Seq(("a", 1L), ("a", 2L), ("b", 10L)).toDF("k", "x"),
      base)
    MaterializedView.create(spark, base, view, "k", "x")
    assert(viewRows(view) == recompute(base))

    // append + overwrite-with-update + delete, refreshed in one step
    SnapshotStore.commit(Seq(("b", 5L), ("c", 7L)).toDF("k", "x"),
      base, SaveMode.Append)
    assert(MaterializedView.refresh(spark, base, view, "k", "x").nonEmpty)
    assert(viewRows(view) == recompute(base))

    // a full overwrite that drops group 'a' entirely
    SnapshotStore.commit(Seq(("b", 4L), ("c", 9L), ("c", 1L)).toDF("k", "x"),
      base, SaveMode.Overwrite)
    assert(MaterializedView.refresh(spark, base, view, "k", "x").nonEmpty)
    assert(viewRows(view) == recompute(base))
    assert(!viewRows(view).exists(_._1 == "a"), "emptied group must drop out")

    // current view: refresh returns None and commits nothing
    val v = SnapshotStore.latestVersion(view)
    assert(MaterializedView.refresh(spark, base, view, "k", "x").isEmpty)
    assert(SnapshotStore.latestVersion(view) == v)
  }

  test("crash between view commit and cursor ack: redelivered delta is skipped, not double-applied") {
    val base = fresh(); val view = fresh()
    SnapshotStore.commit(Seq(("a", 1L)).toDF("k", "x"),
      base)
    MaterializedView.create(spark, base, view, "k", "x")
    SnapshotStore.commit(Seq(("a", 2L)).toDF("k", "x"),
      base, SaveMode.Append)
    assert(MaterializedView.refresh(spark, base, view, "k", "x").nonEmpty)
    val good = viewRows(view)

    // simulate the crash: rewind the consumer cursor to before the
    // refresh (as if the process died after the view commit landed
    // but before ackChanges ran)
    val id = "mv-" + java.security.MessageDigest.getInstance("MD5")
      .digest(view.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    val cursor = new java.io.File(new java.io.File(base, "_consumers"), id)
    java.nio.file.Files.writeString(cursor.toPath, "1")

    val v = SnapshotStore.latestVersion(view)
    assert(MaterializedView.refresh(spark, base, view, "k", "x").isEmpty,
      "redelivered delta must be recognized as already applied")
    assert(SnapshotStore.latestVersion(view) == v)
    assert(viewRows(view) == good, "the delta must not double-apply")
    // and the cursor healed forward
    assert(SnapshotStore.consumerVersion(base, id) == 2)

    // the HARD case (maxStep=1 is load-bearing): crash-rewind the
    // cursor again, but let the base ADVANCE before the next refresh —
    // a head-coalesced delta would double-apply its v2 prefix; the
    // stepped refresh skips v2 and applies only v3
    java.nio.file.Files.writeString(cursor.toPath, "1")
    SnapshotStore.commit(Seq(("a", 3L)).toDF("k", "x"),
      base, SaveMode.Append)
    assert(MaterializedView.refresh(spark, base, view, "k", "x").nonEmpty)
    assert(viewRows(view) == recompute(base),
      "stepped refresh must skip the applied prefix and land only v3")
    assert(SnapshotStore.consumerVersion(base, id) == 3)
  }

  test("rebuild via create with a mid-stream cursor: full view, not the tail delta (r17)") {
    val base = fresh(); val view = fresh()
    SnapshotStore.commit(Seq(("a", 1L), ("b", 10L)).toDF("k", "x"), base)
    MaterializedView.create(spark, base, view, "k", "x")
    SnapshotStore.commit(Seq(("c", 5L)).toDF("k", "x"), base, SaveMode.Append)
    assert(MaterializedView.refresh(spark, base, view, "k", "x").nonEmpty)

    // outage scenario: the base advances further, then the operator
    // REBUILDS via create (the class doc's recommended catch-up path).
    // The per-view cursor sits mid-stream (v2 of 3) — a cursor-driven
    // create would aggregate only v3's delta and publish it as the
    // whole view.
    SnapshotStore.commit(Seq(("a", 100L), ("d", 7L)).toDF("k", "x"),
      base, SaveMode.Append)
    MaterializedView.create(spark, base, view, "k", "x")
    assert(viewRows(view) == recompute(base),
      "rebuild must aggregate the full base head, whatever the cursor")

    // cursor-current rebuild (the 'base table is empty' failure shape
    // before the fix): create again with nothing new to consume
    MaterializedView.create(spark, base, view, "k", "x")
    assert(viewRows(view) == recompute(base))

    // and incremental refresh still works after a rebuild
    SnapshotStore.commit(Seq(("d", 3L)).toDF("k", "x"), base, SaveMode.Append)
    assert(MaterializedView.refresh(spark, base, view, "k", "x").nonEmpty)
    assert(viewRows(view) == recompute(base))
  }
}
