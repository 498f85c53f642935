package graft.streaming

import graft.SparkSpec
import graft.sinks.SnapshotStore

/** Streaming data-quality monitor: per-batch constraint reports land
  * exactly once in the quality-log table; cumulative totals match. */
class DqStreamSpec extends SparkSpec {
  import spark.implicits._

  test("per-batch constraint reports, FAIL detection, exactly-once replay, totals") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val log = java.nio.file.Files
      .createTempDirectory("graft-dqlog").toString + "/t"
    val constraints = Seq(
      "v-positive" -> "v > 0",
      "id-small" -> "id < 1000")

    val input = MemoryStream[(Long, Long)](spark)
    val q = input.toDF().toDF("id", "v").writeStream
      .foreachBatch(DqStream.monitorInto(log, constraints) _)
      .start()
    try {
      input.addData((1L, 5L), (2L, 7L))       // clean batch
      q.processAllAvailable()
      input.addData((3L, -1L), (4L, 2L))      // one v-violation
      q.processAllAvailable()
    } finally q.stop()

    val rows = SnapshotStore.read(spark, log)
      .select("batch_id", "check_name", "n_rows", "n_violations", "verdict")
      .as[(Long, String, Long, Long, String)].collect().toSet
    assert(rows == Set(
      (0L, "v-positive", 2L, 0L, "PASS"),
      (0L, "id-small", 2L, 0L, "PASS"),
      (1L, "v-positive", 2L, 1L, "FAIL"),
      (1L, "id-small", 2L, 0L, "PASS")))

    // exactly-once: re-offering an already-processed batch id is skipped
    val before = SnapshotStore.latestVersion(log)
    DqStream.monitorInto(log, constraints)(
      Seq((9L, -9L)).toDF("id", "v"), 1L)
    assert(SnapshotStore.latestVersion(log) == before,
      "replayed batch must not land twice")

    val tot = DqStream.totals(spark, log)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(tot == Set(
      ("id-small", 2L, 4L, 0L, 0L),
      ("v-positive", 2L, 4L, 1L, 1L)))
  }

  test("constraint names share addConstraint's contract: a dotted name is rejected at declaration, not at runtime (r17)") {
    val log = java.nio.file.Files
      .createTempDirectory("graft-dqn").toString + "/log"
    val ex = intercept[IllegalArgumentException] {
      DqStream.monitorInto(log, Seq("bad.name" -> "v > 0"))(
        Seq((1L, 1L)).toDF("id", "v"), 0L)
    }
    assert(ex.getMessage.contains("bad.name"))
  }
}
