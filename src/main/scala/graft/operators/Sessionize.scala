package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Gap-based sessionization (batch): consecutive events of a user
  * belong to one session while the inter-event gap stays under the
  * threshold.
  *
  * One shuffle on the key, two window passes within the same sort
  * order (lag → running sum), then a partial-aggregated groupBy on
  * (key, session) that reuses the same partitioning — Catalyst sees the
  * child's hash partitioning on user_id and elides the second shuffle.
  */
object Sessionize {

  def sessions(events: DataFrame, gapMinutes: Long = 30): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = gapMinutes * 60L * 1000000L
    val prevTs = lag(col("ts"), 1).over(w)
    val isNew = when(prevTs.isNull ||
      unix_micros(col("ts")) - unix_micros(prevTs) > gapUs, 1L).otherwise(0L)
    events
      .withColumn("_new", isNew)
      .withColumn("session_idx",
        sum(col("_new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .orderBy(col("user_id"), col("session_idx"))
  }

  def sessionize(t: Tables): DataFrame = sessions(t.events)
}
