package graft.streaming

import graft.sinks.SnapshotStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}

/** Structured-Streaming TAIL of a [[SnapshotStore]] table's changelog —
  * the streaming face of the checkpointed incremental consumer
  * (consumeChanges/ackChanges): a file stream WATCHES the table's
  * manifest directory (one new `v*.manifest` per commit — file-count
  * rows, never data), and each notification wakes the cursor-driven
  * consumer, which delivers everything between the consumer's acked
  * version and the PUBLISHED head as one keyed CDC delta. Deltas are
  * cursor-driven, notifications only wake it, so:
  *
  *   - delivery is at-least-once (ack-after-process; an idempotent
  *     downstream — keyed upsert — makes it exactly-once, the
  *     streamSink rule at the consumer side);
  *   - an unpublished manifest (commit crashed before the pointer
  *     landed) is never delivered: the cursor stops at
  *     `latestVersion`, and if heal rolls the manifest back the
  *     notification was a no-op — a RECREATED same-numbered manifest
  *     won't re-notify (file sources dedupe by path), so that delta
  *     rides along with the next commit's wake-up: delayed, never
  *     wrong;
  *   - restart needs no streaming state: the file-source checkpoint
  *     remembers seen manifests, the `_consumers` pointer remembers
  *     the cursor — both survive the JVM.
  *
  * First delivery is the BOOTSTRAP: the whole live table as inserts
  * (consumeChanges' from=0 rule), then O(delta) forever — the
  * raw-commits → curated-appends incremental-pipeline loop
  * (IncrementalPipelineSpec) with the polling driver replaced by a
  * streaming query. Vacuum retention must exceed the stream's lag,
  * exactly as for the batch consumer. */
object CdcTail {

  /** A writeStream builder for tailing `path`'s changelog: attach a
    * trigger/checkpoint and `start()`. `process(delta, toVersion)`
    * receives each cursor advance; the ack lands AFTER it returns. */
  def tail(spark: SparkSession, path: String, consumerId: String,
           key: Option[String] = None)
          (process: (DataFrame, Long) => Unit): DataStreamWriter[_] = {
    // string join, not java.io.File: the table root may be
    // scheme-qualified (hdfs://, the r18 LogStore surface) and File
    // would collapse the double slash
    val snaps = path.stripSuffix("/") + "/_snapshots"
    spark.readStream
      .option("pathGlobFilter", "v*.manifest")
      .text(snaps)
      .writeStream
      .foreachBatch { (_: DataFrame, _: Long) =>
        var draining = true
        while (draining)
          // maxStep = 1: one delivery per VERSION, so a crash between
          // process and ack re-delivers the identical delta under the
          // identical toVersion — an idempotent downstream keyed on it
          // (streamSink's batch-id rule) stays exactly-once. A
          // head-coalesced redelivery would be a wider range under a
          // larger id, duplicating its already-landed prefix.
          SnapshotStore.consumeChanges(spark, path, consumerId, key,
            maxStep = 1L) match {
            case (Some(delta), to) =>
              // a suppressed changelog (pure compaction / identical
              // rewrite) advances the cursor WITHOUT a delivery — the
              // downstream must not see an empty commit
              if (!delta.isEmpty) process(delta, to)
              SnapshotStore.ackChanges(path, consumerId, to)
            case (None, _) => draining = false
          }
      }
  }

  /** Convenience: tail into another SnapshotStore table (the curated
    * side of the incremental loop) — each delta's rows land as ONE
    * append commit carrying the `_change` column; replays are handled
    * by the batch-id rule (toVersion as the idempotency key). */
  def tailInto(spark: SparkSession, srcPath: String, dstPath: String,
               consumerId: String, key: Option[String] = None)
      : DataStreamWriter[_] =
    tail(spark, srcPath, consumerId, key) { (delta, to) =>
      // streamSink's batch-id rule dedupes a replayed delta by itself
      SnapshotStore.streamSink(dstPath)(delta, to)
    }

  /** Start a tail with a fresh checkpoint dir (spec/dev helper). */
  def start(w: DataStreamWriter[_]): StreamingQuery =
    w.option("checkpointLocation",
      java.nio.file.Files.createTempDirectory("graft-cdctail-ck").toString)
      .start()
}
