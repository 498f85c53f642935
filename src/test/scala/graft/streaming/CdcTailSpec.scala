package graft.streaming

import graft.SparkSpec
import graft.sinks.SnapshotStore
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

class CdcTailSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft-cdctail").toString + "/t"

  test("CdcTail: bootstrap then O(delta) keyed CDC per commit, cursor survives restart") {
    val src = freshTable()
    SnapshotStore.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), src)

    val seen = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Seq[(Long, String, String)])]
    def collectTo(delta: org.apache.spark.sql.DataFrame, to: Long): Unit =
      seen.synchronized {
        seen += to -> delta.select("id", "s", "_change")
          .as[(Long, String, String)].collect().sortBy(_._1).toSeq
      }

    val ck = java.nio.file.Files.createTempDirectory("graft-ct-ck").toString
    def query() = CdcTail.tail(spark, src, "tailspec", Some("id"))(collectTo)
      .option("checkpointLocation", ck).start()

    val q = query()
    try {
      q.processAllAvailable()
      // bootstrap: whole table as inserts at v1
      assert(seen.toSeq == Seq(1L -> Seq(
        (1L, "a", "insert"), (2L, "b", "insert"))))

      // a commit with an update + an insert wakes the tail with ONE delta
      SnapshotStore.commit(
        Seq((1L, "a"), (2L, "B"), (3L, "c")).toDF("id", "s"), src)
      q.processAllAvailable()
      assert(seen.size == 2 && seen(1) == (2L -> Seq(
        (2L, "B", "update"), (3L, "c", "insert"))))

      // identical rewrite (compaction shape): notification fires, the
      // keyed changelog is EMPTY, no delivery happens
      SnapshotStore.commit(
        Seq((1L, "a"), (2L, "B"), (3L, "c")).toDF("id", "s"), src)
      q.processAllAvailable()
      assert(seen.size == 2)
    } finally q.stop()

    // restart from the same checkpoint: nothing re-delivers, and a
    // post-restart commit arrives as its own delta (cursor + file
    // checkpoint both persisted)
    SnapshotStore.commit(Seq((2L, "B"), (3L, "c")).toDF("id", "s"), src)
    val q2 = query()
    try {
      q2.processAllAvailable()
      assert(seen.size == 3 && seen(2) == (4L -> Seq((1L, "a", "delete"))))
    } finally q2.stop()
  }

  test("CdcTail.tailInto: commits land in the destination table exactly once") {
    val src = freshTable(); val dst = freshTable()
    SnapshotStore.commit(Seq((1L, "a")).toDF("id", "s"), src)
    val q = CdcTail.start(CdcTail.tailInto(spark, src, dst, "tailinto",
      Some("id")))
    try {
      q.processAllAvailable()
      SnapshotStore.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), src,
        SaveMode.Overwrite)
      q.processAllAvailable()
      val rows = SnapshotStore.read(spark, dst)
        .select("id", "s", "_change").as[(Long, String, String)]
        .collect().toSet
      assert(rows == Set((1L, "a", "insert"), (2L, "b", "insert")))
      // replaying the last batch id against the dst is a no-op
      val v = SnapshotStore.latestVersion(dst)
      SnapshotStore.streamSink(dst)(
        Seq((2L, "b", "insert")).toDF("id", "s", "_change"),
        SnapshotStore.lastStreamBatch(dst))
      assert(SnapshotStore.latestVersion(dst) == v)
    } finally q.stop()
  }
}
