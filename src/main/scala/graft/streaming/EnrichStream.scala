package graft.streaming

import graft.sinks.SnapshotStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Stream-side CDC ENRICHMENT — the slowly-changing broadcast-refresh
  * problem: a fact stream must join a dimension that ITSELF advances
  * via CDC while the stream runs.
  *
  * Spark's stock stream-static join binds the static side's snapshot
  * AT PLAN TIME: a dim update after `start()` is invisible until the
  * query restarts. The composition here re-resolves the dim INSIDE the
  * foreachBatch body instead — [[SnapshotStore.read]] resolves the
  * head manifest pointer at CALL time, so every micro-batch joins the
  * dim version current at that instant, and a dim commit between
  * micro-batches is reflected without restarting the stream. The join
  * is a per-batch broadcast of a bounded dimension (the sanctioned
  * small-dim broadcast — a dimension that outgrows the broadcast
  * threshold should flow as a second CDC stream into a keyed state
  * store instead, a different operator).
  *
  * Delivery semantics are [[CdcTail]]'s: the fact delta is
  * cursor-driven and at-least-once; landing it through
  * [[SnapshotStore.streamSink]] with the cursor's toVersion as the
  * batch id makes the sink exactly-once (a replayed delta is skipped
  * by the batch-id rule). Each output row carries `dim_v`, the dim
  * version it was enriched against — the lineage a late-arriving-dim
  * audit needs (and what the spec asserts).
  *
  * Reference shape: the ETL loop re-reads its lookup tables from the
  * source API on every poll cycle (2023.R:28-60 rebuilds the
  * area/species maps before each document batch) — this is that
  * refresh rule, but incremental on both sides. */
object EnrichStream {

  /** Tail `factPath`'s changelog (keyed by the fact's PRIMARY key
    * `factCdcKey` — the classification key, distinct from the join
    * key), left-join each delta against the CURRENT head of the
    * `dimPath` dimension on `joinKey` = `dimKey` (unmatched facts
    * survive with null dim columns — enrichment must never drop
    * facts), stamp the dim version used, and land the result in
    * `dstPath` exactly once. Attach a checkpoint and `start()`. */
  def enrichInto(spark: SparkSession, factPath: String, dimPath: String,
                 dstPath: String, consumerId: String, factCdcKey: String,
                 joinKey: String, dimKey: String): DataStreamWriter[_] =
    CdcTail.tail(spark, factPath, consumerId, Some(factCdcKey)) { (delta, to) =>
      val dimV = SnapshotStore.latestVersion(dimPath)
      val dim = SnapshotStore.read(spark, dimPath, Some(dimV))
        .withColumnRenamed(dimKey, joinKey)
      val enriched = delta
        .join(broadcast(dim), Seq(joinKey), "left")
        .withColumn("dim_v", lit(dimV))
      SnapshotStore.streamSink(dstPath)(enriched, to)
    }

  /** One-shot batch twin (spec surface): enrich a CDC range of
    * `factPath` (base version `fromV` EXCLUSIVE, readChanges'
    * convention) against a PINNED dim version — what a backfill uses
    * to reproduce a past enrichment exactly. */
  def enrichRange(spark: SparkSession, factPath: String, dimPath: String,
                  fromV: Long, toV: Long, dimVersion: Long,
                  factCdcKey: String, joinKey: String,
                  dimKey: String): DataFrame = {
    val delta = SnapshotStore.readChanges(spark, factPath, fromV, toV,
      Some(factCdcKey))
    val dim = SnapshotStore.read(spark, dimPath, Some(dimVersion))
      .withColumnRenamed(dimKey, joinKey)
    delta.join(broadcast(dim), Seq(joinKey), "left")
      .withColumn("dim_v", lit(dimVersion))
  }
}
