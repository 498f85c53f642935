/** This file lives under `org.apache.spark.sql.graft` ON PURPOSE: a V1
  * streaming Source's getBatch must return a frame with
  * `isStreaming = true`, and the only way to build one is
  * `SparkSession.internalCreateDataFrame(rdd, schema, isStreaming)`,
  * which is `private[sql]` — the same reason Delta Lake's DeltaSource
  * ships under `org.apache.spark.sql.delta`. Nothing else here touches
  * Spark internals; all table logic stays in graft.sinks.SnapshotStore. */
package org.apache.spark.sql.graft

import graft.sinks.SnapshotStore
import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.connector.read.streaming.{Offset => OffsetV2,
  ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Micro-batch OFFSET of a graft table stream: the last snapshot
  * version the batch covers. The engine's offset log persists `json`
  * and replays ranges by it — version numbers are exactly-once,
  * monotone, and replay-stable, the ideal offset. */
case class GraftStreamOffset(version: Long) extends OffsetV1 {
  override val json: String = version.toString
}

/** `spark.readStream.format("graft")` — the standard DataStreamReader
  * surface over a [[SnapshotStore]] table (r17; the Delta-source
  * shape), completing the registered source: batch read/write, SQL,
  * writeStream sink, and now the streaming SOURCE.
  *
  * {{{
  *   // exact CDC deltas (Delta CDF's streaming surface):
  *   spark.readStream.format("graft")
  *     .option("readChangeFeed", "true").option("key", "id")
  *     .load(path)                    // table columns + _change
  *   // appended rows only (append-mostly tables):
  *   spark.readStream.format("graft").load(path)
  * }}}
  *
  * Offsets are snapshot VERSIONS. Each micro-batch delivers the
  * changelog of `(lastOffset, head]` — the manifest set-difference, so
  * a batch reads O(changed files), never the table. The FIRST batch
  * bootstraps: the whole live snapshot as inserts (or, with
  * `startingVersion`, the change feed from that version, inclusive —
  * [[SnapshotStore.changeFeed]]'s anchoring rule when retention has
  * advanced past it). Exactly-once is the ENGINE's offset log: a
  * restarted query replays the same version range, and the range's
  * delta is a pure function of the immutable manifests — delivery is
  * deterministic, so any sink discipline (foreachBatch + batch-id,
  * the graft sink itself) lands each delta once.
  *
  * Options: `readChangeFeed` (exact I/U/D rows with `_change`; `key`
  * selects keyed classification), `startingVersion` (inclusive CDF
  * start instead of a snapshot bootstrap), `maxVersionsPerBatch`
  * (catch-up rate limit — a long-offline consumer steps its backlog
  * in bounded batches instead of one giant plan),  `ignoreChanges`
  * (non-CDF mode: accept re-delivery of rewritten rows instead of
  * failing on update/delete/compaction — Delta's option and rule,
  * see [[SnapshotStore.readAppends]]).
  *
  * Retention contract (same as the batch consumers): [[SnapshotStore
  * .vacuum]]'s window must exceed the stream's lag — a stream behind
  * retention fails fast on the missing manifest and must restart from
  * a fresh checkpoint (Delta semantics).
  *
  * Scale: `getOffset` is one pointer-file read; `getBatch` plans a
  * scan of only the files the range added/removed. A 100 TB table
  * with appends streams at the cost of the appended files per batch —
  * table size never enters. */
class GraftStreamSource(
    sqlContext: SQLContext,
    path: String,
    cdf: Boolean,
    key: Option[String],
    startingVersion: Option[Long],
    maxVersionsPerBatch: Long,
    ignoreChanges: Boolean,
    withCommitVersion: Boolean = false)
  extends Source with SupportsTriggerAvailableNow {

  require(maxVersionsPerBatch >= 1,
    s"maxVersionsPerBatch must be >= 1, got $maxVersionsPerBatch")
  require(cdf || key.isEmpty,
    "option key requires readChangeFeed=true (append mode has no diff)")
  require(cdf || startingVersion.isEmpty,
    "option startingVersion requires readChangeFeed=true")
  require(cdf || !withCommitVersion,
    "option withCommitVersion requires readChangeFeed=true")

  private val spark = sqlContext.sparkSession

  override val schema: StructType =
    GraftStreamSource.schemaFor(spark, path, cdf, withCommitVersion)

  /** Rate-limit cursor: the highest offset this instance has OFFERED.
    * Only a soft bound — on restart it resets and the engine's logged
    * start offset governs (the first catch-up batch may exceed the
    * cap, Delta's wrinkle too); −1 = nothing offered yet. */
  private var lastPlanned: Long = -1L

  /** Trigger.AvailableNow (the KafkaSource pattern): the engine calls
    * [[prepareForTriggerAvailableNow]] once at query start; every
    * offset offered afterwards is CAPPED at the head pinned there, so
    * the query drains exactly the backlog that existed at start and
    * terminates — the scheduled-batch-job consumption shape. */
  private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(SnapshotStore.latestVersion(path))

  /** Admission-control surface (the engine prefers this over
    * [[getOffset]] when present): same offer rule, explicit start. */
  override def latestOffset(startOffset: OffsetV2, limit: ReadLimit)
      : OffsetV2 = {
    if (lastPlanned < 0 && startOffset != null)
      lastPlanned = startOffset.json.trim.toLong
    getOffset.orNull
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def reportLatestOffset(): OffsetV2 = {
    val head = SnapshotStore.latestVersion(path)
    if (head == 0L) null else GraftStreamOffset(head)
  }

  private def versionOf(o: OffsetV1): Long = o.json.trim.toLong

  override def getOffset: Option[OffsetV1] = {
    val head0 = SnapshotStore.latestVersion(path)
    val head = availableNowCap.fold(head0)(math.min(_, head0))
    if (head == 0L) None
    // a startingVersion ABOVE the head is a future version: idle (no
    // batch) until it is committed — Delta waits the same way; offering
    // the head would plan changeFeed(sv, head) with fromV > toV and
    // fail the query on a configuration that is merely early (r18).
    else if (lastPlanned < 0 && startingVersion.exists(_ > head)) None
    else {
      // the cap's baseline: the last offer; before any offer, the
      // startingVersion's predecessor (its backlog steps in bounded
      // batches) — or the head itself for a snapshot bootstrap, which
      // is one batch whatever the cap.
      val base =
        if (lastPlanned >= 0) lastPlanned
        else startingVersion.map(sv => math.min(sv, head) - 1).getOrElse(head)
      // step, not base + cap: the unbounded default would overflow Long
      val next = base + math.min(maxVersionsPerBatch, head - base)
      if (next <= lastPlanned) Some(GraftStreamOffset(lastPlanned))
      else { lastPlanned = next; Some(GraftStreamOffset(next)) }
    }
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val endV = versionOf(end)
    lastPlanned = math.max(lastPlanned, endV) // restart: resume the cap here
    val batch: DataFrame = start.map(versionOf) match {
      case Some(sv) if endV <= sv =>
        // replayed no-op range (engine edge case): schema-true empty —
        // built from the PINNED schema directly, so asStreaming's
        // divergence check (r18) sees exactly the declared columns
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      case Some(sv) =>
        if (cdf && withCommitVersion)
          SnapshotStore.readChangesVersioned(spark, path, sv, endV, key)
        else if (cdf) SnapshotStore.readChanges(spark, path, sv, endV, key)
        else SnapshotStore.readAppends(spark, path, sv, endV, ignoreChanges)
      case None =>
        // FIRST batch. CDF + startingVersion: the feed from that
        // version inclusive. Otherwise: bootstrap — the endV snapshot
        // as inserts (consumeChanges' rule; in append mode the rows
        // ARE the appends-so-far).
        (cdf, startingVersion) match {
          case (true, Some(sv)) if withCommitVersion =>
            SnapshotStore.changeFeedVersioned(spark, path, sv, endV, key)
          case (true, Some(sv)) =>
            SnapshotStore.changeFeed(spark, path, sv, endV, key)
          case (true, None) =>
            val boot = SnapshotStore.read(spark, path, Some(endV))
              .withColumn("_change", lit("insert"))
            if (withCommitVersion)
              boot.withColumn("_commit_version", lit(endV))
                .withColumn("_commit_timestamp",
                  lit(new java.sql.Timestamp(
                    SnapshotStore.commitTime(path, endV))))
            else boot
          case (false, _) =>
            SnapshotStore.read(spark, path, Some(endV))
        }
    }
    asStreaming(batch)
  }

  /** Rebase a BATCH plan onto its executed RDD as a STREAMING frame
    * with the source's declared schema (column order enforced — the
    * engine unions batches positionally). Rows are copied out of the
    * reused unsafe buffers before they cross the boundary.
    *
    * SCHEMA-EVOLUTION CONTRACT (r18, Delta's rule): the schema is
    * pinned at stream start; a mid-stream commit that ADDS, RENAMES,
    * or DROPS a column makes the batch's columns diverge from the pin
    * and FAILS the query with a restart message — silently projecting
    * the pinned subset would drop the added column from every batch
    * (data loss the consumer cannot detect), and a positional union
    * against a renamed/dropped shape would misattribute columns.
    * Restarting re-pins the live schema; a CDF restart from a fresh
    * checkpoint replays history under the new shape. */
  private def asStreaming(df: DataFrame): DataFrame = {
    val pinned = schema.fieldNames.toSet
    val extra = df.columns.filterNot(pinned)
    val missing = schema.fieldNames.filterNot(df.columns.toSet)
    if (extra.nonEmpty || missing.nonEmpty)
      throw new IllegalStateException(
        s"graft stream source: the schema of $path evolved mid-stream (" +
          (if (extra.nonEmpty)
            s"column(s) ${extra.mkString(", ")} added since stream start"
          else "") +
          (if (extra.nonEmpty && missing.nonEmpty) "; " else "") +
          (if (missing.nonEmpty)
            s"pinned column(s) ${missing.mkString(", ")} renamed or dropped"
          else "") +
          ") - the stream's schema is pinned at start; restart the " +
          "query (CDF: from a new checkpoint) to pick up the new shape")
    val aligned = df.select(schema.fieldNames.toIndexedSeq.map(col): _*)
    val rdd = aligned.queryExecution.toRdd.map(_.copy())
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)
  }

  override def commit(end: OffsetV1): Unit = () // retention is vacuum's job

  override def stop(): Unit = ()

  override def toString: String =
    s"GraftStreamSource[$path${if (cdf) ", cdf" else ""}]"
}

object GraftStreamSource {

  /** The stream's FIXED schema: the live table's columns (+ `_change`
    * in CDF mode). Pinned at stream start; ANY mid-stream schema
    * change — a column added, renamed, or dropped — fails the query
    * with a restart message (asStreaming's divergence check, r18;
    * Delta's behavior). Restart to pick up the new shape. */
  def schemaFor(spark: org.apache.spark.sql.SparkSession, path: String,
                cdf: Boolean, withCommitVersion: Boolean = false)
      : StructType = {
    val base = SnapshotStore.read(spark, path).schema
    if (!cdf) base
    else {
      val c = StructType(base.fields :+ StructField("_change", StringType))
      if (!withCommitVersion) c
      else StructType(c.fields :+
        StructField("_commit_version", org.apache.spark.sql.types.LongType) :+
        StructField("_commit_timestamp",
          org.apache.spark.sql.types.TimestampType))
    }
  }

  /** Build from DataStreamReader options (the provider's createSource). */
  def fromOptions(sqlContext: SQLContext, path: String,
                  parameters: Map[String, String]): GraftStreamSource =
    new GraftStreamSource(
      sqlContext, path,
      cdf = parameters.get("readChangeFeed").exists(_.equalsIgnoreCase("true")),
      key = parameters.get("key"),
      startingVersion = parameters.get("startingVersion").map(_.toLong),
      maxVersionsPerBatch = parameters.get("maxVersionsPerBatch")
        .map(_.toLong).getOrElse(Long.MaxValue),
      ignoreChanges =
        parameters.get("ignoreChanges").exists(_.equalsIgnoreCase("true")),
      withCommitVersion = parameters.get("withCommitVersion")
        .exists(_.equalsIgnoreCase("true")))
}
