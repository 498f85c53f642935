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

  /** Gap-based sessionization via the BUILT-IN `session_window`
    * (Spark 3.2+) — the declarative twin of SessionStream's
    * flatMapGroupsWithState kernel: same gap semantics (a session's
    * window ends `gap` after its last event; an event extends the
    * session iff it lands strictly before that end), but session
    * state, merging, and eviction are ENGINE-managed — the form to
    * prefer when the per-group logic is expressible, keeping the
    * custom-state kernel for semantics windowed aggs can't say.
    * Works identically in batch (the oracled q_session_window) and
    * streaming (attach a watermark via [[sessionWindowStream]]). */
  def sessionWindowCounts(events: DataFrame,
                          gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).cast("long").as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"),
        col("n_events"))

  /** Streaming variant: the watermark both admits late data within 10
    * minutes and lets the engine finalize + evict closed sessions. */
  def sessionWindowStream(events: DataFrame,
                          gap: String = "30 minutes"): DataFrame =
    sessionWindowCounts(events.withWatermark("ts", "10 minutes"), gap)

  /** Batch oracle instance. */
  def sessionWindowBatch(t: Tables): DataFrame =
    sessionWindowCounts(t.events).orderBy(col("user_id"), col("s_start"))

  /** Stream-static enrichment: a streaming event feed joined to a
    * static dimension (user → segment) with a broadcast hint, then
    * windowed counts per segment. The static side is re-read per
    * micro-batch at planning time but never shuffles the stream —
    * map-side enrichment is exactly the 100 TB/day posture (the
    * stream's watermark alone bounds state; a static join adds none). */
  def enrichedWindowCounts(events: DataFrame, userDim: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .join(broadcast(userDim), Seq("user_id"))
      .groupBy(window(col("ts"), "1 hour"), col("segment"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("segment"), col("n"))

  /** Watermarked stream-stream join: each purchase joined to clicks of
    * the same user within the preceding hour. Both watermarks bound the
    * join state; the time-range condition lets Spark evict click state
    * once the purchase watermark passes click_ts + 1h. */
  def purchaseClickJoin(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val p = purchases.select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "10 minutes")
    val c = clicks.select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "10 minutes")
    p.join(c,
      col("user_id") === col("c_user") &&
        col("click_ts") <= col("p_ts") &&
        col("click_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("purchase_id"), col("user_id"), col("click_id"),
        col("p_ts"), col("click_ts"))
  }

  /** Left-outer variant: purchases with NO click in the preceding hour
    * still emit (click_id null) — but only once the click watermark
    * has passed the end of their match window, i.e. when the state
    * store can PROVE no match can still arrive. Same bounded state as
    * the inner join; the eviction deadline is what turns "no match
    * yet" into "no match ever". */
  def purchaseClickJoinOuter(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val p = purchases.select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "10 minutes")
    val c = clicks.select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "10 minutes")
    p.join(c,
      col("user_id") === col("c_user") &&
        col("click_ts") <= col("p_ts") &&
        col("click_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"),
      "left_outer")
      .select(col("purchase_id"), col("user_id"), col("click_id"),
        col("p_ts"), col("click_ts"))
  }
}
