package graft.sources

import graft.SparkSpec
import graft.sinks.SnapshotStore
import org.apache.spark.sql.{DataFrame, SaveMode}

/** `spark.readStream.format("graft")` — the streaming CDC source
  * (r17): version offsets, O(changed files) micro-batches, bootstrap +
  * per-commit keyed deltas exactly-once across a restart, parity with
  * the CdcTail consumer, and the append-tail (non-CDF) mode with
  * Delta's data-update rejection rule. */
class GraftStreamSourceSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft-streamsrc").toString + "/t"

  private def drain(df: DataFrame, ck: String)
                   (collect: (DataFrame, Long) => Unit) = {
    val q = df.writeStream
      .option("checkpointLocation", ck)
      .foreachBatch(collect)
      .start()
    q.processAllAvailable()
    q
  }

  test("readChangeFeed stream: bootstrap + keyed per-commit deltas, exactly-once across restart") {
    val path = fresh()
    SnapshotStore.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), path)

    val seen = scala.collection.mutable.ArrayBuffer
      .empty[Set[(Long, String, String)]]
    def collect(df: DataFrame, id: Long): Unit = seen.synchronized {
      val rows = df.select("id", "s", "_change")
        .as[(Long, String, String)].collect().toSet
      if (rows.nonEmpty) seen += rows
    }

    def stream() = spark.readStream.format("graft")
      .option("readChangeFeed", "true").option("key", "id")
      .load(path)

    val ck = java.nio.file.Files.createTempDirectory("graft-ss-ck").toString
    val q = drain(stream(), ck)(collect)
    try {
      // bootstrap: the whole live table as inserts
      assert(seen.toSeq == Seq(Set((1L, "a", "insert"), (2L, "b", "insert"))))

      // one commit (update + insert) → one exact keyed delta
      SnapshotStore.commit(
        Seq((1L, "a"), (2L, "B"), (3L, "c")).toDF("id", "s"), path)
      q.processAllAvailable()
      assert(seen.size == 2 &&
        seen(1) == Set((2L, "B", "update"), (3L, "c", "insert")))

      // identical rewrite (compaction shape): offset advances, the
      // keyed changelog is empty — no delivery
      SnapshotStore.commit(
        Seq((1L, "a"), (2L, "B"), (3L, "c")).toDF("id", "s"), path)
      q.processAllAvailable()
      assert(seen.size == 2)
    } finally q.stop()

    // restart from the same checkpoint: nothing re-delivers; a commit
    // made while the stream was DOWN arrives as its own delta
    SnapshotStore.commit(Seq((2L, "B"), (3L, "c")).toDF("id", "s"), path)
    val q2 = drain(stream(), ck)(collect)
    try {
      assert(seen.size == 3 && seen(2) == Set((1L, "a", "delete")))
    } finally q2.stop()
  }

  test("stream deltas match the CdcTail consumer on the same commit history") {
    val path = fresh()
    SnapshotStore.commit(Seq((1L, 10L), (2L, 20L)).toDF("id", "x"), path)
    SnapshotStore.commit(Seq((1L, 10L), (2L, 25L), (3L, 30L)).toDF("id", "x"),
      path)
    SnapshotStore.commit(Seq((2L, 25L), (3L, 30L)).toDF("id", "x"), path)

    // batch-consumer truth: bootstrap at v1 + per-version keyed deltas
    val viaConsumer = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, String)]
    var going = true
    val cid = "streamsrcparity"
    while (going) SnapshotStore.consumeChanges(spark, path, cid,
      Some("id"), maxStep = 1L) match {
      case (Some(d), to) =>
        viaConsumer ++= d.select("id", "x", "_change")
          .as[(Long, Long, String)].collect()
        SnapshotStore.ackChanges(path, cid, to)
      case (None, _) => going = false
    }

    val viaStream = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, String)]
    val ck = java.nio.file.Files.createTempDirectory("graft-ss-ck2").toString
    val q = drain(
      spark.readStream.format("graft")
        .option("readChangeFeed", "true").option("key", "id")
        .option("startingVersion", "1")
        .option("maxVersionsPerBatch", "1") // the consumer's stepping
        .load(path), ck) { (df, _) =>
      viaStream.synchronized {
        viaStream ++= df.select("id", "x", "_change")
          .as[(Long, Long, String)].collect()
      }
    }
    try assert(viaStream.sorted.toSeq == viaConsumer.sorted.toSeq)
    finally q.stop()
  }

  test("append-mode stream: appended rows only; a rewriting commit fails with guidance unless ignoreChanges") {
    val path = fresh()
    SnapshotStore.commit(Seq((1L, "a")).toDF("id", "s"), path)

    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val ck = java.nio.file.Files.createTempDirectory("graft-ss-ck3").toString
    val q = drain(
      spark.readStream.format("graft").load(path), ck) { (df, _) =>
      seen.synchronized { seen ++= df.as[(Long, String)].collect() }
    }
    try {
      assert(seen.toSet == Set((1L, "a")))
      SnapshotStore.commit(Seq((2L, "b")).toDF("id", "s"), path,
        SaveMode.Append)
      q.processAllAvailable()
      assert(seen.toSet == Set((1L, "a"), (2L, "b")))

      // an OVERWRITE removed files: the append stream must fail fast
      // (delivering added files would re-deliver rewritten rows)
      SnapshotStore.commit(Seq((1L, "a"), (2L, "b"), (3L, "c"))
        .toDF("id", "s"), path, SaveMode.Overwrite)
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e =>
          Option(e.getMessage).toSeq ++ msgs(e.getCause))
      assert(msgs(ex).exists(_.contains("readChangeFeed")))
    } finally q.stop()

    // ignoreChanges: same history streams, rewritten rows re-delivered
    val seen2 = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val ck2 = java.nio.file.Files.createTempDirectory("graft-ss-ck4").toString
    val q2 = drain(
      spark.readStream.format("graft").option("ignoreChanges", "true")
        .load(path), ck2) { (df, _) =>
      seen2.synchronized { seen2 ++= df.as[(Long, String)].collect() }
    }
    try assert(seen2.toSet == Set((1L, "a"), (2L, "b"), (3L, "c")))
    finally q2.stop()
  }

  test("withCommitVersion: every delivered row is stamped with its producing version (r17)") {
    val path = fresh()
    SnapshotStore.commit(Seq((1L, "a")).toDF("id", "s"), path)          // v1
    SnapshotStore.commit(Seq((1L, "A"), (2L, "b")).toDF("id", "s"), path) // v2
    SnapshotStore.commit(Seq((2L, "b")).toDF("id", "s"), path)          // v3

    val seen = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, Long)]
    val ck = java.nio.file.Files.createTempDirectory("graft-ss-ckv").toString
    val q = drain(
      spark.readStream.format("graft")
        .option("readChangeFeed", "true").option("key", "id")
        .option("startingVersion", "1")
        .option("withCommitVersion", "true")
        .load(path), ck) { (df, _) =>
      seen.synchronized {
        seen ++= df.select("id", "_change", "_commit_version")
          .as[(Long, String, Long)].collect()
      }
    }
    try {
      assert(seen.sorted.toSeq == Seq(
        (1L, "delete", 3L),   // v3 removed id 1
        (1L, "insert", 1L),   // v1 bootstrap
        (1L, "update", 2L),   // v2 changed it
        (2L, "insert", 2L)))
      // the batch relation agrees with the stream
      SnapshotStore.commit(Seq((2L, "B")).toDF("id", "s"), path)        // v4
      val batch = spark.read.format("graft")
        .option("readChangeFeed", "true").option("key", "id")
        .option("startingVersion", "4")
        .option("withCommitVersion", "true")
        .load(path)
        .select("id", "_change", "_commit_version")
        .as[(Long, String, Long)].collect().toSeq
      assert(batch == Seq((2L, "update", 4L)))
      q.processAllAvailable()
      assert(seen.size == 5 && seen.last == ((2L, "update", 4L)))
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains the backlog and terminates (batch-job CDC consumption)") {
    val path = fresh()
    SnapshotStore.commit(Seq((1L, "a")).toDF("id", "s"), path)
    SnapshotStore.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), path)
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val ck = java.nio.file.Files.createTempDirectory("graft-ss-an").toString
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true").option("key", "id")
      .load(path)
      .writeStream
      .option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized {
          seen ++= df.select("id", "_change").as[(Long, String)].collect()
        }
        ()
      }.start()
    // AvailableNow terminates on its own once the backlog drains — the
    // scheduled-ingest shape (run a batch job, consume everything new,
    // exit) without a polling driver
    assert(q.awaitTermination(120000), "AvailableNow query must terminate")
    assert(seen.toSet == Set((1L, "insert"), (2L, "insert")))
    // a later commit is NOT consumed (the query is gone) until the
    // next scheduled run, which resumes from the checkpoint
    SnapshotStore.commit(Seq((1L, "a"), (2L, "B")).toDF("id", "s"), path)
    val q2 = spark.readStream.format("graft")
      .option("readChangeFeed", "true").option("key", "id")
      .load(path)
      .writeStream
      .option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized {
          seen ++= df.select("id", "_change").as[(Long, String)].collect()
        }
        ()
      }.start()
    assert(q2.awaitTermination(120000))
    assert(seen.drop(2).toSeq == Seq((2L, "update")))
  }

  test("maxVersionsPerBatch bounds catch-up batches") {
    val path = fresh()
    (1 to 4).foreach { i =>
      SnapshotStore.commit(Seq((i.toLong, s"v$i")).toDF("id", "s"), path,
        if (i == 1) SaveMode.Overwrite else SaveMode.Append)
    }
    val batches = scala.collection.mutable.ArrayBuffer.empty[Int]
    val ck = java.nio.file.Files.createTempDirectory("graft-ss-ck5").toString
    val q = drain(
      spark.readStream.format("graft")
        .option("readChangeFeed", "true").option("key", "id")
        .option("startingVersion", "2")
        .option("maxVersionsPerBatch", "1")
        .load(path), ck) { (df, _) =>
      val n = df.count().toInt
      if (n > 0) batches.synchronized { batches += n }
    }
    // versions 2..4 are three single-insert commits; startingVersion=2
    // is inclusive, so the first batch carries v2 and stepping yields
    // one insert per batch
    try assert(batches.toSeq == Seq(1, 1, 1))
    finally q.stop()
  }

  test("startingVersion above the head idles until that version is committed (r18)") {
    val path = fresh()
    SnapshotStore.commit(Seq((1L, "a")).toDF("id", "s"), path) // v1
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String)]
    val ck = java.nio.file.Files.createTempDirectory("graft-ss-ck6").toString
    val q = drain(
      spark.readStream.format("graft")
        .option("readChangeFeed", "true").option("key", "id")
        .option("startingVersion", "3")
        .load(path), ck) { (df, _) =>
      seen.synchronized {
        seen ++= df.select("id", "s", "_change")
          .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      }
    }
    try {
      // v3 does not exist yet: the stream must idle, not fail
      // (Delta waits for a future startingVersion the same way)
      assert(q.exception.isEmpty && seen.isEmpty)
      SnapshotStore.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), path) // v2
      q.processAllAvailable()
      assert(q.exception.isEmpty && seen.isEmpty, "still below startingVersion")
      SnapshotStore.commit(
        Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s"), path) // v3
      q.processAllAvailable()
      // delivery starts AT v3: exactly its keyed delta
      assert(seen.toSet == Set((3L, "c", "insert")))
    } finally q.stop()
  }

  test("a RESTORE mid-stream delivers the rollback diff as one exact delta (r18)") {
    val path = fresh()
    SnapshotStore.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), path) // v1
    val seen = scala.collection.mutable.ArrayBuffer
      .empty[Set[(Long, String, String)]]
    val ck = java.nio.file.Files.createTempDirectory("graft-ss-ck9").toString
    val q = drain(
      spark.readStream.format("graft")
        .option("readChangeFeed", "true").option("key", "id")
        .load(path), ck) { (df, _) =>
      seen.synchronized {
        val rows = df.select("id", "s", "_change")
          .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
          .toSet
        if (rows.nonEmpty) seen += rows
      }
    }
    try {
      SnapshotStore.commit(
        Seq((1L, "a"), (2L, "B"), (3L, "c")).toDF("id", "s"), path) // v2
      q.processAllAvailable()
      assert(seen.last == Set((2L, "B", "update"), (3L, "c", "insert")))
      SnapshotStore.restore(spark, path, 1L)                        // v3
      q.processAllAvailable()
      // the rollback arrives as its own keyed delta: the update
      // reverts, the rolled-back insert deletes
      assert(seen.last == Set((2L, "b", "update"), (3L, "c", "delete")),
        seen.last.toString)
    } finally q.stop()
  }

  test("mid-stream schema evolution fails with a restart message, CDF and append modes (r18)") {
    import org.apache.spark.sql.streaming.StreamingQueryException
    // CDF mode: a column ADDED mid-stream must fail the query (the
    // pinned schema cannot carry it; silently dropping it would be
    // undetectable data loss), with restart guidance in the message.
    val path = fresh()
    SnapshotStore.commit(Seq((1L, "a")).toDF("id", "s"), path)
    val ck = java.nio.file.Files.createTempDirectory("graft-ss-ck7").toString
    val q = drain(
      spark.readStream.format("graft")
        .option("readChangeFeed", "true").option("key", "id")
        .load(path), ck) { (_, _) => () }
    try {
      assert(q.exception.isEmpty)
      SnapshotStore.commit(
        Seq((2L, "b", 9L)).toDF("id", "s", "extra"), path, SaveMode.Append)
      val e = intercept[StreamingQueryException] { q.processAllAvailable() }
      val msg = e.getCause.getMessage
      assert(msg.contains("evolved mid-stream") && msg.contains("extra") &&
        msg.contains("restart"), msg)
    } finally q.stop()

    // append mode: same contract
    val path2 = fresh()
    SnapshotStore.commit(Seq((1L, "a")).toDF("id", "s"), path2)
    val ck2 = java.nio.file.Files.createTempDirectory("graft-ss-ck8").toString
    val q2 = drain(
      spark.readStream.format("graft").load(path2), ck2) { (_, _) => () }
    try {
      assert(q2.exception.isEmpty)
      SnapshotStore.commit(
        Seq((2L, "b", 9L)).toDF("id", "s", "extra"), path2, SaveMode.Append)
      val e2 = intercept[StreamingQueryException] { q2.processAllAvailable() }
      assert(e2.getCause.getMessage.contains("evolved mid-stream"),
        e2.getCause.getMessage)
    } finally q2.stop()
  }
}
