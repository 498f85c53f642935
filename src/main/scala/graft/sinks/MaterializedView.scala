package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MATERIALIZED aggregate views over snapshot tables with INCREMENTAL
  * refresh — the reusable component behind the q_ivm gate (which
  * proves the maintenance algebra incremental ≡ recompute under
  * DuckDB). A view is `SELECT key, COUNT(*) n, SUM(sumCol) s GROUP BY
  * key` over a base snapshot table, stored as a snapshot table
  * itself; `refresh` advances it using ONLY the base's CDC deltas:
  *
  *   - the base read is [[SnapshotStore.consumeChanges]] under a
  *     per-view consumer cursor at `maxStep = 1` — O(changed files)
  *     via the manifest set-difference, never a base re-scan.
  *     Single-version stepping is the EXACTLY-ONCE discipline
  *     consumeChanges documents (the CdcTail rule): a crash between
  *     view commit and ack redelivers the IDENTICAL single-version
  *     delta under the identical id, which the view's batch-id check
  *     skips — whereas a head-coalesced redelivery would be a WIDER
  *     range whose already-applied prefix would double-count.
  *     Refresh assumes ONE refresher per view (the standard MV
  *     scheduler contract); concurrent refreshers of the SAME view
  *     need external coordination. The stepping makes CATCH-UP cost
  *     O(versions-behind) groups-sized view commits — the price of
  *     exactly-once without a transactional cursor; schedule refresh
  *     at commit-comparable cadence, or rebuild via [[create]] (one
  *     full aggregate) after a long outage.
  *   - unkeyed CDC is the correct feed for distributive aggregates:
  *     an update is delete(old)+insert(new); identical rewrites
  *     cancel exactly in the ±1 signed aggregate.
  *   - the merge full-outer-joins the (groups-sized, ≪ base) view
  *     with the (delta-sized) aggregate and rewrites the view —
  *     O(groups), not O(base); groups whose count reaches 0 drop out.
  *
  * Scale: a 100 TB base with daily appends refreshes at the cost of
  * one aggregate over the appended files plus a groups-sized commit.
  */
object MaterializedView {

  private def viewId(viewPath: String): String =
    "mv-" + java.security.MessageDigest.getInstance("MD5")
      .digest(viewPath.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)

  /** Signed per-key aggregate of a CDC frame: inserts count +1,
    * deletes −1; sums carry the same sign. */
  private def deltaAgg(changes: DataFrame, key: String,
                       sumCol: String): DataFrame = {
    val sign = when(col("_change") === "insert", 1L).otherwise(-1L)
    changes.select(col(key), col(sumCol).cast("long").as("_x"), sign.as("_sg"))
      .groupBy(col(key))
      .agg(sum(col("_sg")).cast("long").as("n"),
        sum(col("_x") * col("_sg")).cast("long").as("s"))
  }

  /** Define + fully compute the view from the base's live version,
    * anchoring the CDC cursor there. Returns the view's version.
    *
    * Reads the base HEAD directly — never through the per-view cursor:
    * this is also the REBUILD path (the class doc recommends it after
    * a long outage), and a rebuild's cursor already sits mid-stream,
    * so a cursor-driven read would deliver only the tail delta and
    * Overwrite-commit it as the whole view (silently wrong), or —
    * cursor current — deliver nothing. A full-snapshot read as
    * inserts is the correct aggregate regardless of cursor state; the
    * ack then jumps the cursor to the head (monotone — it can only be
    * at or below the head). */
  def create(spark: SparkSession, basePath: String, viewPath: String,
             key: String, sumCol: String): Long = {
    val id = viewId(viewPath)
    val headV = SnapshotStore.latestVersion(basePath)
    require(headV > 0, s"base table $basePath is empty")
    val base = SnapshotStore.read(spark, basePath, Some(headV))
      .withColumn("_change", lit("insert"))
    val v = SnapshotStore.commit(deltaAgg(base, key, sumCol)
        .filter(col("n") > 0),
      viewPath, batchId = Some(headV))
    SnapshotStore.ackChanges(basePath, id, headV)
    v
  }

  /** Incremental refresh: apply everything the base committed since
    * the last acknowledged version, one base version per view commit
    * (`maxStep = 1` — see the class doc for why coalescing would
    * double-apply after a crash). Returns the last view version
    * committed, or None when the view was already current. Crash-safe:
    * each delivered base version rides its view commit as the batch
    * id, so a redelivered single-version delta is skipped, then
    * re-acked — the cursor heals forward. */
  def refresh(spark: SparkSession, basePath: String, viewPath: String,
              key: String, sumCol: String): Option[Long] = {
    val id = viewId(viewPath)
    var last: Option[Long] = None
    var done = false
    while (!done) {
      SnapshotStore.consumeChanges(spark, basePath, id, maxStep = 1L) match {
        case (None, _) => done = true
        case (Some(changes), toV) =>
          if (toV > SnapshotStore.lastStreamBatch(viewPath)) {
            val delta = deltaAgg(changes, key, sumCol)
              .withColumnRenamed("n", "dn").withColumnRenamed("s", "ds")
            val merged = SnapshotStore.read(spark, viewPath)
              .join(delta, Seq(key), "full")
              .select(col(key),
                (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L)))
                  .as("n"),
                (coalesce(col("s"), lit(0L)) + coalesce(col("ds"), lit(0L)))
                  .as("s"))
              .filter(col("n") > 0)
            last = Some(SnapshotStore.commit(merged, viewPath,
              batchId = Some(toV)))
          }
          SnapshotStore.ackChanges(basePath, id, toV)
      }
    }
    last
  }
}
