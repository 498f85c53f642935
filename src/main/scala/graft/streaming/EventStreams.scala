package graft.streaming

import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming transforms over the events stream. The same
  * plan works in batch (the oracle instance q_stream_window) and
  * streaming mode — Spark's unified Dataset semantics; the watermark
  * bounds state so a 100 TB/day stream holds only the open hour windows
  * per executor.
  */
object EventStreams {

  /** Tumbling 1-hour event counts per type. With a streaming input,
    * attach `withWatermark` first (see windowedCountsStream). */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))

  /** Streaming variant: 10-minute watermark → late data beyond that is
    * dropped and window state is evicted (bounded memory). */
  def windowedCountsStream(events: DataFrame): DataFrame =
    windowedCounts(events.withWatermark("ts", "10 minutes"))

  /** Batch oracle instance. */
  def streamWindowBatch(t: Tables): DataFrame =
    windowedCounts(t.events).orderBy(col("win_start"), col("event_type"))
}
