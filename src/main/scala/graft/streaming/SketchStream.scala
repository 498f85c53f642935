package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.DataFrame

/** Streaming count-min sketch — the streaming twin of
  * `TextAnalysis.heavyHitters`' counter table.
  *
  * A count-min sketch is a LINEAR sketch: its state is a fixed
  * depth×width grid of integer counters and its merge is plain
  * addition. That makes the streaming form exactly Structured
  * Streaming's native stateful aggregation — no custom
  * flatMapGroupsWithState, no watermark, and no approximation ON TOP
  * of the sketch's own: the counters after any prefix of the stream
  * are BIT-EQUAL to the batch sketch over the same rows
  * (StreamingSpec pins the equivalence across micro-batch
  * boundaries). State is bounded by construction at depth×width rows
  * regardless of stream length or vocabulary growth — the reason a
  * 100 TB/day ingest can keep a live frequency oracle when even the
  * distinct token set no longer fits anywhere.
  *
  * The bucket hash is the shared md5-31bit family
  * (`TextAnalysis.cmsBucket`), so a streaming-maintained counter
  * table can be probed by the SAME batch query the oracle gate
  * verifies (`q_heavy_hitters`), and a Lambda-architecture backfill
  * is byte-compatible with the online path — the `SampleStream`
  * contract, for sketches. */
object SketchStream {

  /** Update/complete-mode streaming counter table over a streaming
    * frame with a `text` column. The plan is the batch plan —
    * tokenize → depth-way expand → groupBy(r, b) count — run
    * incrementally; Spark's streaming HashAggregate keeps the
    * (≤ depth×width)-row state and re-emits updated counters each
    * micro-batch. */
  def counters(docs: DataFrame, depth: Int = 4, width: Int = 1024): DataFrame =
    TextAnalysis.cmsCounters(docs, depth, width)
}
