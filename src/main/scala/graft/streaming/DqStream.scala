package graft.streaming

import graft.sinks.SnapshotStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming DATA-QUALITY monitor — the constraint suite of
  * [[graft.operators.DataQuality]] run continuously: every micro-batch
  * is scored against a declared set of CHECK expressions in ONE fused
  * map-side aggregate (n constraints ≠ n passes), and one report row
  * per (batch, constraint) lands in a snapshot-table QUALITY LOG via
  * [[SnapshotStore.streamSink]] — exactly-once, so a restarted query
  * re-offering a processed batch never double-counts. The log is
  * itself a graft table: dashboards read it with plain aggregation,
  * alerting is `verdict = 'FAIL'`, and time travel reproduces what
  * quality looked like at any point.
  *
  * This closes the loop the batch audit leaves open: a nightly
  * q_dq_audit catches bad data AFTER it landed; the stream monitor
  * scores it on the way in, batch by batch, with the same null
  * semantics (CHECK: NULL passes) and the same exact BIGINT counters.
  *
  * Scale: per batch ONE aggregate (constraint-count columns, map-side
  * combined) + a report-sized commit — the monitor's cost is
  * independent of history length; cumulative totals are a groups-sized
  * aggregate over the log table. */
object DqStream {

  /** foreachBatch hook: score `df` against `constraints` (name →
    * boolean SQL expression) and append the per-constraint report to
    * the `logPath` snapshot table under this batch id. */
  def monitorInto(logPath: String, constraints: Seq[(String, String)])
                 (df: DataFrame, batchId: Long): Unit = {
    require(constraints.nonEmpty, "DqStream: need at least one constraint")
    // same name contract as SnapshotStore.addConstraint — the two entry
    // points to violatesCheck must agree. Names become column
    // identifiers below (alias _v_<name> then col(_v_<name>)): a '.'
    // or backtick would break resolution at RUNTIME inside the
    // streaming query; reject it here, at declaration time.
    constraints.foreach { case (n, _) =>
      require(n.matches("[A-Za-z0-9_-]+"),
        s"DqStream: constraint name '$n' (allowed: [A-Za-z0-9_-]+)")
    }
    val report = df.agg(
        count(lit(1)).as("n_rows"),
        constraints.map { case (n, e) =>
          sum(when(graft.operators.DataQuality.violatesCheck(e), 1L)
            .otherwise(0L)).as(s"_v_$n")
        }: _*)
      .select(explode(array(constraints.map { case (n, _) =>
        struct(lit(n).as("check_name"), col("n_rows"),
          col(s"_v_$n").as("n_violations"))
      }: _*)).as("c"))
      .select(lit(batchId).as("batch_id"), col("c.check_name"),
        coalesce(col("c.n_rows"), lit(0L)).cast("long").as("n_rows"),
        coalesce(col("c.n_violations"), lit(0L)).cast("long")
          .as("n_violations"))
      .withColumn("verdict",
        when(col("n_violations") === 0, "PASS").otherwise("FAIL"))
    SnapshotStore.streamSink(logPath)(report, batchId)
  }

  /** Cumulative totals over the quality log (dashboard shape): per
    * constraint, batches seen, rows checked, violations, failing
    * batches. */
  def totals(spark: org.apache.spark.sql.SparkSession,
             logPath: String): DataFrame =
    SnapshotStore.read(spark, logPath)
      .groupBy(col("check_name"))
      .agg(count(lit(1)).as("n_batches"),
        sum(col("n_rows")).cast("long").as("rows_checked"),
        sum(col("n_violations")).cast("long").as("violations"),
        sum(when(col("verdict") === "FAIL", 1L).otherwise(0L)).cast("long")
          .as("failing_batches"))
      .orderBy(col("check_name"))
}
