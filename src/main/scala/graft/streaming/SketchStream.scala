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

  /** Streaming HyperLogLog register table — the streaming twin of
    * `q_hll_audit`'s register build. Stronger merge story than the
    * count-min counters: register max is idempotent AND commutative,
    * so the streaming state is exact not just under arbitrary
    * micro-batch boundaries but under AT-LEAST-ONCE re-delivery —
    * re-processing a whole batch cannot move a single register
    * (StreamingSpec re-delivers one and pins it). State is bounded at
    * 2^p rows forever; the batch estimator formula applied to the
    * streaming-built registers reproduces the oracled q_hll_audit
    * estimate bit-for-bit.
    *
    * No `spread` fan-out here (the batch operator's repartition
    * assumes a file-scan input; a streaming micro-batch arrives
    * already parallel), and no per-doc `array_distinct` (register max
    * is duplicate-insensitive, so the registers match q_hll_audit's
    * distinct-shingle build exactly either way). */
  def hllRegisters(docs: DataFrame, p: Int = 10): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions
    val m = 1 << p
    docs
      .select(TextFunctions.tokens(col("text")).as("toks"))
      .select(explode(TextFunctions.wordNgramsOf(col("toks"), 3)).as("g"))
      .select(graft.operators.Dedup.md5Hash31(col("g")).as("hv"))
      .select((col("hv") % m).as("reg"), expr(s"hv DIV $m").as("h2"))
      .select(col("reg"), when(col("h2") === 0, lit(22))
        .otherwise(lit(22) - length(bin(col("h2")))).as("rank"))
      .groupBy(col("reg")).agg(max(col("rank")).as("mj"))
  }
}
