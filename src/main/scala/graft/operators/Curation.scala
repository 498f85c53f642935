package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Corpus-curation operators: the composed end-to-end shapes a
  * training-data pipeline actually runs (filter → dedup → shard →
  * sample). Each step is the already-verified kernel; the composition
  * itself is one declarative plan.
  */
object Curation {

  /** Quality + language filter → exact-dedup survivors. The whole
    * pipeline is map-side until the single dedup shuffle. */
  def curate(t: Tables): DataFrame = {
    val docs = t.documents
    val toks = graft.functions.TextFunctions.tokens(col("text"))
    val nToks = size(toks).cast("long")
    val filtered = docs
      .select(col("doc_id"), col("text"), col("lang"),
        TextAnalysis.langIdCols(col("text")).last.as("pred_lang"), nToks.as("n_tokens"))
      .filter(col("n_tokens") >= 20 && col("n_tokens") <= 80)
    filtered
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"),
        min(col("pred_lang")).as("pred_lang"))
      .select(col("doc_id"), col("pred_lang"), col("n_copies"))
      .orderBy(col("doc_id"))
  }

  /** One-row corpus statistics (the sanity dashboard numbers). */
  def corpusStats(t: Tables): DataFrame =
    t.documents.agg(
      count(lit(1)).as("n_docs"),
      sum(regexp_count(col("text"), lit("[^ ]+"))).cast("long").as("total_tokens"),
      sum(col("n_chars")).cast("long").as("total_chars"),
      countDistinct(col("lang")).as("n_langs"))

  /** Global row_number WITHOUT a single-partition window (the naive
    * `Window.orderBy(...)` with no partition key funnels the entire
    * table through one task). Range-repartition on the total order,
    * number rows locally per partition, and add broadcast partition
    * offsets. The total order must be unique (include a tie-break id)
    * so the result is identical to a global ROW_NUMBER regardless of
    * where the range boundaries land. */
  def globalRowNumber(df: DataFrame, sortCols: org.apache.spark.sql.Column*): DataFrame = {
    val parts = df
      .repartitionByRange(df.sparkSession.sparkContext.defaultParallelism, sortCols: _*)
      .withColumn("_pid", spark_partition_id())
    val offW = Window.orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parts.groupBy(col("_pid")).agg(count(lit(1)).as("_n"))
      .withColumn("_off", coalesce(sum(col("_n")).over(offW), lit(0L)))
      .select(col("_pid"), col("_off")) // numPartitions rows — tiny
    val local = Window.partitionBy(col("_pid")).orderBy(sortCols: _*)
    parts.join(broadcast(offsets), Seq("_pid"))
      .withColumn("_rn", col("_off") + row_number().over(local))
      .drop("_pid", "_off")
  }

  /** Global running sum WITHOUT a single-partition window — same
    * construction as [[globalRowNumber]]: range-repartition on the
    * total order, per-partition local running sums, plus broadcast
    * per-partition totals as offsets. `valueCol` must be an exact
    * (integer/long) column so offset addition is associative. */
  def globalRunningSum(df: DataFrame, valueCol: String,
                       sortCols: org.apache.spark.sql.Column*): DataFrame = {
    val parts = df
      .repartitionByRange(df.sparkSession.sparkContext.defaultParallelism, sortCols: _*)
      .withColumn("_pid", spark_partition_id())
    val offW = Window.orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parts.groupBy(col("_pid"))
      .agg(sum(col(valueCol)).as("_s")) // numPartitions rows — tiny
      .withColumn("_off", coalesce(sum(col("_s")).over(offW), lit(0L)))
      .select(col("_pid"), col("_off"))
    val local = Window.partitionBy(col("_pid")).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parts.join(broadcast(offsets), Seq("_pid"))
      .withColumn("_cum", col("_off") + sum(col(valueCol)).over(local))
      .drop("_pid", "_off")
  }

  /** Token-budget shard packing: documents in doc_id order fill shards
    * of ~`budget` tokens each (shard = exclusive-prefix-sum DIV
    * budget) — how a training run cuts a corpus into fixed-cost chunks
    * while preserving order. Built on the scalable running sum; the
    * per-shard rollup is one skinny aggregate. The prefix sums stay
    * well under 2^53, so the floor(double) division is exact (and
    * matches any engine's DIV). */
  def tokenPack(t: Tables, budget: Long = 4000L): DataFrame = {
    val sized = t.documents.select(col("doc_id"),
      size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("tok"))
    globalRunningSum(sized, "tok", col("doc_id"))
      .withColumn("shard",
        floor((col("_cum") - col("tok")) / lit(budget.toDouble)).cast("long"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tok")).cast("long").as("shard_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("shard"))
  }

  /** Balanced shard assignment: order by size desc, round-robin over
    * `shards` — the deterministic approximation of greedy bin packing
    * (within one item of optimal for the max shard), built on the
    * scalable global row number. */
  def shardBalance(t: Tables, shards: Int = 8): DataFrame = {
    val tok = regexp_count(col("text"), lit("[^ ]+")).cast("long")
    val sized = t.documents.select(col("doc_id"), tok.as("tok"))
    globalRowNumber(sized, col("tok").desc, col("doc_id"))
      .withColumn("shard", ((col("_rn") - 1) % shards).cast("long"))
      .groupBy(col("shard"))
      .agg(sum(col("tok")).cast("long").as("shard_tokens"), count(lit(1)).as("n_docs"))
      .orderBy(col("shard"))
  }

  /** Content-defined chunking (the Rabin/FastCDC idea at word
    * granularity): a chunk boundary falls AFTER token j whenever the
    * md5-derived 31-bit hash of the k-gram ending at j is ≡ 0 mod
    * `target` — boundaries depend only on LOCAL content, so an
    * insertion early in a document shifts at most one chunk instead of
    * re-slicing everything (the property fixed-size chunking lacks,
    * and the reason dedup storage and incremental training-data
    * pipelines chunk this way). Average chunk length ≈ `target`
    * tokens. Entirely map-side (per-row HOF array ops over the token
    * array; the md5 gram hash is the winnowing/LSH oracle device) —
    * at 100 TB this runs at scan speed. Emits per-doc chunk stats +
    * an order-preserving fingerprint digest. */
  def cdcChunks(t: Tables, k: Int = 2, target: Int = 8): DataFrame =
    cdcChunkFrame(t, k, target)
      .select(col("doc_id"), col("n").as("n_toks"),
        size(col("lens")).cast("long").as("n_chunks"),
        array_min(col("lens")).cast("long").as("min_len"),
        array_max(col("lens")).cast("long").as("max_len"),
        md5(concat_ws(",", col("fps"))).as("fp_sig"))
      .orderBy(col("doc_id"))

  /** Exploded per-chunk view (doc_id, chunk_idx, fp, len) — the form
    * chunk-store writers and cross-doc dedup consume. */
  def cdcChunkList(docs: DataFrame, k: Int = 2, target: Int = 8): DataFrame =
    cdcChunkFrameOf(docs, k, target)
      .select(col("doc_id"),
        posexplode(arrays_zip(col("fps"), col("lens"))).as(Seq("chunk_idx", "c")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("c.fps").as("fp"), col("c.lens").cast("long").as("len"))

  /** (doc_id, n, ends, lens, fps) — the shared CDC chunk layout. */
  private def cdcChunkFrame(t: Tables, k: Int, target: Int): DataFrame =
    cdcChunkFrameOf(t.documents.select(col("doc_id"), col("text")), k, target)

  private def cdcChunkFrameOf(documents: DataFrame, k: Int,
                              target: Int): DataFrame = {
    val toks = graft.functions.TextFunctions.tokens(col("text"))
    graft.operators.Dedup.spread(documents.select(col("doc_id"), col("text")))
      .select(col("doc_id"), toks.as("toks"))
      .filter(size(col("toks")) >= 1)
      .withColumn("n", size(col("toks")))
      // cuts strictly BEFORE the end; the last token always closes its
      // chunk (append n, never dedupe — deterministic in both engines)
      .withColumn("ends", concat(
        when(col("n") >= k,
          filter(sequence(lit(k), col("n")),
            j => graft.operators.Dedup.md5Hash31(
              concat_ws(" ", slice(col("toks"), j - (k - 1), lit(k))))
              % target === 0 && j < col("n")))
          .otherwise(array().cast("array<int>")),
        array(col("n"))))
      .withColumn("starts", transform(sequence(lit(1), size(col("ends"))),
        i => when(i === 1, lit(1))
          .otherwise(element_at(col("ends"), i - 1) + 1)))
      .withColumn("lens", zip_with(col("ends"), col("starts"), (e, st) => e - st))
      .withColumn("lens", transform(col("lens"), d => d + 1))
      .withColumn("fps", transform(sequence(lit(1), size(col("ends"))),
        i => md5(concat_ws(" ", slice(col("toks"),
          element_at(col("starts"), i),
          element_at(col("ends"), i) - element_at(col("starts"), i) + 1)))))
  }

  /** Chunk-level dedup over the CDC chunks — the storage-dedup
    * metric: how much of each document is made of chunks that occur
    * MORE THAN ONCE in the corpus. One explode + one fingerprint
    * aggregate + one join back (all equi on the fingerprint — at
    * 100 TB the chunk-frequency table is the only shuffled state, and
    * it is corpus-unique-chunk-sized, not corpus-sized). */
  def cdcChunkDedup(t: Tables, k: Int = 2, target: Int = 8): DataFrame = {
    val ch = cdcChunkFrame(t, k, target)
      .select(col("doc_id"), col("n"),
        explode(arrays_zip(col("fps"), col("lens"))).as("c"))
      .select(col("doc_id"), col("n"), col("c.fps").as("fp"),
        col("c.lens").cast("long").as("len"))
    val freq = ch.groupBy(col("fp"))
      .agg(count(lit(1)).as("cnt"))
    ch.join(freq, Seq("fp"))
      .groupBy(col("doc_id"))
      .agg(first(col("n")).cast("long").as("n_toks"),
        count(lit(1)).as("n_chunks"),
        sum(when(col("cnt") >= 2, 1L).otherwise(0L)).as("n_dup_chunks"),
        expr("CAST(FLOOR(1000000.0 * SUM(CASE WHEN cnt >= 2 THEN len ELSE 0 END) / first(n)) AS BIGINT)")
          .as("dup_token_ppm"))
      .orderBy(col("doc_id"))
  }

  /** Sliding-window chunking (retrieval / context-window prep): each
    * document yields chunks of `size` tokens starting every `stride`
    * tokens (overlap = size − stride), the standard RAG chunker.
    * Entirely map-side — the start offsets come from a `sequence`
    * explode on the already-materialized token array, so at 100 TB
    * this runs at scan speed with zero shuffles before the output
    * sort. chunk_id = start/stride is exact (start is a multiple of
    * stride); the tail chunk is short by construction (`slice`
    * truncates at the end of the array). */
  def chunkOverlap(t: Tables, size: Int = 50, stride: Int = 40): DataFrame = {
    require(stride > 0 && size >= stride, "chunks must cover every token")
    val toks = graft.functions.TextFunctions.tokens(col("text"))
    t.documents
      .select(col("doc_id"), toks.as("toks"),
        org.apache.spark.sql.functions.size(toks).cast("long").as("n"))
      .select(col("doc_id"), col("toks"), col("n"),
        explode(sequence(lit(0L), col("n") - 1, lit(stride.toLong))).as("start"))
      .select(
        col("doc_id"),
        (col("start") / stride).cast("long").as("chunk_id"),
        least(lit(size.toLong), col("n") - col("start")).as("n_tok"),
        md5(concat_ws(" ", slice(col("toks"), (col("start") + 1).cast("int"), lit(size))))
          .as("chunk_hash"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** Source-mixture balancing: per-source token counts → the sampling
    * weight (in ppm) that levels every source to the uniform share
    * total/n_sources, capped at `maxWeightPpm` (an over-represented
    * source is down-sampled; an under-represented one is up-weighted /
    * repeated up to the cap — the standard mixture-rebalance step
    * before training). One skinny per-source aggregate + a broadcast
    * one-row total; ALL arithmetic is bigint (floor division), so the
    * published weights are exact and engine-independent. */
  /** Temperature-scaled source mixture at T = 1/2 (the UNIMAX / mT5
    * family's temperature sampling, p_s ∝ n_s^(1/T) with the exponent
    * realized as a SQUARE ROOT): sampling shares proportional to
    * √tokens flatten the source distribution — over-represented
    * sources are tempered, small sources boosted — without the hard
    * uniform target [[mixtureWeights]] levels to. Cross-engine
    * exactness without libm pow: SQRT is IEEE-correctly-rounded in
    * both engines and each per-source weight is floored to an INTEGER
    * immediately (w_s = ⌊√n_s⌋), so the share denominator is an
    * integer sum — order-independent, no float-accumulation drift —
    * and every published share/allocation is exact bigint arithmetic.
    *
    * Scale: one per-source aggregate (skinny) + a broadcast one-row
    * total; the corpus is scanned once for token counts. */
  def sqrtMixture(t: Tables): DataFrame = {
    val per = t.documents
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(regexp_count(col("text"), lit("[^ ]+"))).cast("long").as("src_tokens"))
      .withColumn("w", expr("CAST(FLOOR(SQRT(CAST(src_tokens AS DOUBLE))) AS BIGINT)"))
    val tot = per.agg(sum(col("w")).as("w_total"),
      sum(col("src_tokens")).as("total_tokens"))
    per.crossJoin(broadcast(tot))
      .withColumn("share_ppm", expr("w * 1000000 DIV w_total"))
      .withColumn("sampled_tokens", expr("total_tokens * share_ppm DIV 1000000"))
      .select(col("source"), col("n_docs"), col("src_tokens"), col("w"),
        col("share_ppm"), col("sampled_tokens"))
      .orderBy(col("source"))
  }

  def mixtureWeights(t: Tables, maxWeightPpm: Long = 4000000L): DataFrame = {
    val per = t.documents
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(regexp_count(col("text"), lit("[^ ]+"))).cast("long").as("src_tokens"))
    val tot = per.agg(sum(col("src_tokens")).as("total_tokens"),
      count(lit(1)).as("n_sources"))
    per.crossJoin(broadcast(tot))
      .withColumn("target_tokens", expr("total_tokens DIV n_sources"))
      .withColumn("weight_ppm",
        least(lit(maxWeightPpm), expr("target_tokens * 1000000 DIV src_tokens")))
      .withColumn("sampled_tokens", expr("src_tokens * weight_ppm DIV 1000000"))
      .select(col("source"), col("n_docs"), col("src_tokens"),
        col("target_tokens"), col("weight_ppm"), col("sampled_tokens"))
      .orderBy(col("source"))
  }

  /** Fixed-length SEQUENCE packing — the final training-prep step:
    * concatenate documents in doc_id order and cut the token stream
    * into training rows of exactly `seqLen` tokens (documents span cut
    * points; the last sequence is short). Built on the scalable global
    * running sum: each doc knows its exclusive start offset, so the
    * sequences it overlaps are start DIV L .. (end−1) DIV L — a
    * map-side `sequence` explode, no window over the corpus. Per
    * sequence: overlapping docs, docs fully inside, exact token fill
    * (= L everywhere but the tail), and the doc range — all bigint
    * arithmetic, engine-exact. A doc longer than L simply spans
    * multiple sequences (fill sums stay exact), so the operator needs
    * no max-doc-length precondition. */
  def seqPack(t: Tables, seqLen: Long = 512L): DataFrame = {
    val sized = t.documents.select(col("doc_id"),
      size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("tok"))
    seqPackSized(sized, seqLen)
  }

  /** [[seqPack]] over an arbitrary (doc_id, tok) frame — the reusable
    * packing stage [[pipelineE2E]] feeds with dedup survivors. */
  def seqPackSized(docSizes: DataFrame, seqLen: Long): DataFrame = {
    val sized = docSizes
      // A zero-token doc overlaps no sequence; without this guard, one
      // whose start offset lands exactly on a seqLen boundary hits
      // Spark's auto-descending sequence(s, s-1) and emits spurious
      // rows the oracle's generate_series (empty when stop < start)
      // never produces. Unreachable with the current tokenizer (>= 1
      // token/doc) but the operator/oracle parity must not rely on it.
      .filter(col("tok") > 0L)
    globalRunningSum(sized, "tok", col("doc_id"))
      .withColumn("s", col("_cum") - col("tok")) // exclusive start offset
      .withColumn("seq_id", explode(sequence(
        expr(s"s DIV $seqLen"), expr(s"(_cum - 1) DIV $seqLen"))))
      .withColumn("fill", least(col("_cum"), (col("seq_id") + 1) * seqLen)
        - greatest(col("s"), col("seq_id") * seqLen))
      .groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(expr(s"s DIV $seqLen") === col("seq_id") &&
          expr(s"(_cum - 1) DIV $seqLen") === col("seq_id"), 1L)
          .otherwise(0L)).as("n_full_docs"),
        sum(col("fill")).cast("long").as("fill_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("seq_id"))
  }

  /** Per-source corpus audit — the "where did my tokens come from"
    * dashboard (docs, tokens, language spread, length extremes, corpus
    * share). One skinny per-source aggregate with map-side partials +
    * a broadcast one-row total. The corpus share is integer ppm
    * (bigint floor division) and the mean doc length is ONE
    * correctly-rounded double division of two exact longs — both
    * engine-independent. */
  def sourceAudit(t: Tables): DataFrame = {
    val tok = regexp_count(col("text"), lit("[^ ]+")).cast("long")
    val per = t.documents
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(tok).cast("long").as("src_tokens"),
        countDistinct(col("lang")).as("n_langs"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
    val tot = per.agg(sum(col("n_docs")).as("tot_docs"))
    per.crossJoin(broadcast(tot))
      .withColumn("mean_tokens", col("src_tokens").cast("double") / col("n_docs"))
      .withColumn("share_ppm", expr("n_docs * 1000000 DIV tot_docs"))
      .select(col("source"), col("n_docs"), col("src_tokens"), col("n_langs"),
        col("min_chars"), col("max_chars"), col("mean_tokens"), col("share_ppm"))
      .orderBy(col("source"))
  }

  /** Deterministic content-hash sampling: reproducible across engines,
    * runs, and machines — no RNG state, the sample is a pure function
    * of content. */
  def sampleHash(t: Tables): DataFrame =
    t.documents
      .filter(substring(md5(col("text")), 1, 1).isin("0", "1", "2", "3"))
      .select(col("doc_id"))
      .orderBy(col("doc_id"))

  /** Stratified sampling: cap every language stratum at ~`target` docs
    * by comparing a content-hash prefix against a per-stratum
    * threshold. The per-stratum fraction comes from one tiny aggregate
    * (broadcast back — strata counts are dimension-sized at any SF);
    * the keep decision is then pure map-side, no RNG, no
    * sampleBy/collect. The 4-hex-digit prefix compares lexicographically
    * exactly like the 16-bit integer it encodes, so the same predicate
    * is expressible in any engine; fraction→threshold uses only
    * correctly-rounded IEEE ops (one divide, one multiply, one floor),
    * bit-identical cross-engine. */
  def stratifiedSample(t: Tables, target: Int = 60): DataFrame = {
    val counts = t.documents.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_lang"))
    val frac = least(lit(1.0), lit(target.toDouble) / col("n_lang"))
    // clamp to 0xffff: frac=1.0 would encode 65536 → 5 hex digits, and
    // lpad TRUNCATES to 4 ('1000'), silently sampling ~6% instead of
    // 100%. The n_lang <= target short-circuit below also covers that
    // stratum, but the threshold must be safe on its own.
    val thresh = lpad(lower(hex(
      least(floor(frac * 65536), lit(65535L)).cast("int"))), 4, "0")
    t.documents
      .join(broadcast(counts), Seq("lang"))
      .filter(col("n_lang") <= target ||
        substring(md5(col("text")), 1, 4) < thresh)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }

  /** Weighted sampling per stratum — Duffield–Lund–Thorup PRIORITY
    * SAMPLING (JACM 54(6), 2007): every doc draws a deterministic
    * md5-uniform u ∈ (0,1] from its id and gets priority w/u with
    * w = n_chars; the k largest priorities per source form the sample.
    * Inclusion probability is ∝ min(1, w/τ) for the group's threshold
    * τ (the (k+1)-th priority), i.e. long documents are favored
    * proportionally to their weight — the length-weighted epoch-mix
    * draw a data pipeline uses when token budget, not doc count, is
    * the quota.
    *
    * Cross-engine determinism is the design constraint: no ln/exp
    * (Efraimidis–Spirakis keys need -ln(u)/w, and libm last-ulp drift
    * between the JVM and DuckDB would flip ranks near the cutoff).
    * Priority = (w · 2³¹) / (h+1) uses one exact int→double cast, one
    * exact multiply (products ≪ 2⁵³), and ONE correctly-rounded IEEE
    * division — bit-identical in any engine.
    *
    * Scale: same two-phase top-k as [[domainCap]] — a per-(source,
    * scan-partition) local top-k bounds what shuffles to k rows per
    * source per task, so a giant stratum never sorts its full list in
    * one task. */
  def weightedSample(t: Tables, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long").bitwiseAND(lit(0x7FFFFFFFL)) + lit(1L)
    val docs = t.documents.select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("priority",
        col("n_chars").cast("double") * lit(2147483648.0) / u.cast("double"))
    val local = Window.partitionBy(col("source"), spark_partition_id())
      .orderBy(col("priority").desc, col("doc_id"))
    val global = Window.partitionBy(col("source"))
      .orderBy(col("priority").desc, col("doc_id"))
    Dedup.spread(docs)
      .withColumn("rl", row_number().over(local)).filter(col("rl") <= k)
      .drop("rl")
      .withColumn("rk", row_number().over(global)).filter(col("rk") <= k)
      .select(col("source"), col("doc_id"), col("n_chars"), col("priority"))
      .orderBy(col("source"), col("priority").desc, col("doc_id"))
  }

  /** Per-domain document caps (RefinedWeb-style "no domain dominates"):
    * within every source keep the `cap` best documents (by n_chars
    * desc, doc_id asc tiebreak) and report what the cap cost each
    * domain. `source` stands in for the registrable domain — the real
    * pipeline keys on eTLD+1.
    *
    * Scale: NO corpus-wide window. The kept set is found two-phase —
    * a per-(source, input-partition) top-`cap` first (row_number over
    * a partition-local key, so each scan task emits ≤ cap rows per
    * source it sees), then the exact per-source top-`cap` over those
    * ≤ cap·partitions survivors. A giant domain therefore never sorts
    * its full document list in one task — the global pass ranks at
    * most cap·partitions skinny rows per source. Totals come from an
    * ordinary map-side-combined aggregate; both sides of the final
    * join are per-source skinny. */
  def domainCap(t: Tables, cap: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = t.documents.select(col("source"), col("doc_id"), col("n_chars"))
    val local = Window.partitionBy(col("source"), spark_partition_id())
      .orderBy(col("n_chars").desc, col("doc_id"))
    val global = Window.partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    val kept = Dedup.spread(docs)
      .withColumn("lrn", row_number().over(local)).filter(col("lrn") <= cap)
      .withColumn("rnk", row_number().over(global)).filter(col("rnk") <= cap)
      .groupBy(col("source"))
      .agg(count(lit(1)).cast("long").as("n_kept"),
        sum(col("n_chars")).cast("long").as("chars_kept"))
    val totals = docs.groupBy(col("source"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("n_chars")).cast("long").as("chars_total"))
    totals.join(kept, Seq("source"))
      .select(col("source"), col("n_docs"), col("n_kept"), col("chars_kept"),
        (col("chars_total") - col("chars_kept")).as("chars_dropped"))
      .orderBy(col("source"))
  }

  /** Public-suffix rules — a representative subset of the (public)
    * Public Suffix List covering every rule CLASS the algorithm must
    * handle: plain TLDs, multi-label suffixes (co.uk, ac.jp,
    * k12.va.us), a wildcard rule (*.ck), its exception (!www.ck), and
    * a private-section registry suffix (github.io). A production run
    * broadcasts the full ~9k-rule list the same way — the dim is
    * list-sized, never corpus-sized. Encoded as (match_key, is_exc,
    * rule_labels): exception rules drop their '!' (the key is what a
    * host tail joins against) and wildcard rules keep the literal
    * '*.' prefix — a tail's wildcard FORM (first label replaced by
    * '*') joins against it. */
  private val pslRules: Seq[(String, Int, Int)] = Seq(
    ("com", 0), ("org", 0), ("net", 0), ("uk", 0), ("co.uk", 0),
    ("org.uk", 0), ("io", 0), ("github.io", 0), ("jp", 0), ("ac.jp", 0),
    ("*.ck", 0), ("www.ck", 1), ("us", 0), ("k12.va.us", 0)
  ).map { case (k, e) => (k, e, k.split("\\.").length) }

  /** Hosts synthesized per document (md5 coin — the testdata has no
    * hostname column), chosen to exercise every PSL path: exact match,
    * longest-of-several, wildcard, exception, a sub-subdomain, an
    * unlisted TLD (implicit-star default), and a bare public suffix
    * (NULL registrable domain). */
  private val hostPool: Seq[String] = Seq(
    "www.acme.com", "blog.widget.co.uk", "contoso.org.uk",
    "fabrikam.github.io", "example.ac.jp", "shop.example.jp",
    "foo.bar.ck", "www.ck", "mail.www.ck", "nonexistent.zz", "com",
    "deep.sub.acme.co.uk")

  /** Registrable-domain (eTLD+1) parsing against a broadcast
    * public-suffix dim — what a real web-corpus domain cap keys on
    * (q_domain_cap's `source` is the stand-in; this operator supplies
    * the production key). Implements the PSL algorithm: every label
    * tail of the host (and its wildcard form) joins the rule dim; the
    * prevailing rule is the exception if one matches, else the most
    * labels; an exception's effective suffix drops the tail's leftmost
    * label; an unmatched host falls to the implicit-star default (the
    * bare TLD). etld1 = prevailing suffix plus one label — NULL when
    * the host IS a public suffix.
    *
    * Scale: tail explosion is map-side (≤2·labels rows per doc), the
    * rule join is against a broadcast list-sized dim, and the
    * prevailing-rule pick is ONE map-side-combined max-of-struct
    * aggregate — the corpus crosses the wire once, skinny. No window,
    * no second corpus join (host/labels ride the aggregate as
    * group-constant firsts). */
  def domainParse(t: Tables): DataFrame = {
    val spark = t.documents.sparkSession
    import spark.implicits._
    val rules = pslRules.toDF("match_key", "is_exc", "rule_labels")
    val hIdx = (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long") % hostPool.length).cast("int")
    val d = Dedup.spread(t.documents.select(col("doc_id")))
      .withColumn("host", element_at(array(hostPool.map(lit): _*), hIdx + 1))
      .withColumn("labels", split(col("host"), "\\."))
      .withColumn("n", size(col("labels")))
    val tails = d
      .select(col("doc_id"), col("host"), col("labels"), col("n"),
        posexplode(transform(sequence(lit(1), col("n")),
          i => array_join(slice(col("labels"), i, col("n") - i + 1), "."))))
      .select(col("doc_id"), col("host"), col("labels"), col("n"),
        (col("pos") + 1).as("i"), col("col").as("tail"))
      .withColumn("wf", // the tail's wildcard form, absent for 1-label tails
        when(col("n") - col("i") >= 1,
          concat(lit("*."), array_join(
            slice(col("labels"), col("i") + 1, col("n") - col("i")), "."))))
    val mk = tails.select(col("doc_id"), col("host"), col("labels"), col("n"),
      col("i"),
      explode(when(col("wf").isNotNull, array(col("tail"), col("wf")))
        .otherwise(array(col("tail")))).as("match_key"))
    val best = mk.join(broadcast(rules), Seq("match_key"), "left")
      .select(col("doc_id"), col("host"), col("labels"), col("n"),
        when(col("rule_labels").isNotNull,
          struct(col("is_exc"),
            (col("rule_labels") - col("is_exc")).as("eff_labels"),
            (col("i") + col("is_exc")).as("suffix_start"))).as("m"))
      .groupBy(col("doc_id"))
      .agg(first(col("host")).as("host"), first(col("labels")).as("labels"),
        first(col("n")).as("n"), max(col("m")).as("m"))
    best
      .withColumn("ss", coalesce(col("m.suffix_start"), col("n")).cast("int"))
      .withColumn("public_suffix",
        array_join(slice(col("labels"), col("ss"), col("n") - col("ss") + 1), "."))
      .withColumn("etld1",
        when(col("ss") >= 2,
          array_join(slice(col("labels"), col("ss") - 1,
            col("n") - col("ss") + 2), ".")))
      .select(col("doc_id"), col("host"), col("public_suffix"), col("etld1"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic train/val/test split manifest: each document lands
    * in a split by an md5 coin on its id against exact ppm boundaries
    * (train < `trainPpm`, val < trainPpm + `valPpm`, else test), and
    * the operator emits the per-split doc/token totals and realized
    * share — the assignment a pipeline freezes BEFORE any training so
    * later reshards can never leak val/test into train. Hash-based
    * (not random) so the split is stable under reruns, insertions,
    * and engine changes; md5 is the oracle-parity coin.
    *
    * Scale: assignment is map-side (hash + CASE per row); the only
    * shuffle is the 3-group aggregate, map-side combined. */
  def splitAssign(t: Tables, trainPpm: Long = 900000L,
                  valPpm: Long = 50000L): DataFrame = {
    val h = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long") % 1000000L
    val d = Dedup.spread(t.documents.select(col("doc_id"), col("text")))
      .select(
        size(graft.functions.TextFunctions.tokens(col("text")))
          .cast("long").as("n_tok"),
        when(h < trainPpm, "train")
          .when(h < trainPpm + valPpm, "val")
          .otherwise("test").as("split"))
    // total from the (≤3-row) grouped frame, NOT a second corpus scan
    val g = d.groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
    val tot = g.agg(sum(col("n_docs")).as("total"))
    g.crossJoin(tot)
      .withColumn("share_ppm", expr("n_docs * 1000000 DIV total"))
      .select(col("split"), col("n_docs"), col("n_tokens"), col("share_ppm"))
      .orderBy(col("split"))
  }

  /** Per-shard INTEGRITY MANIFEST: shard id → row count, byte total,
    * and an order-independent content signature (bit-XOR fold of a
    * 60-bit md5 prefix per document) — what a pipeline publishes next
    * to its shards so any later reader can verify nothing was dropped,
    * duplicated, or bit-rotted in transit, without re-reading order or
    * trusting file sizes. XOR makes the fold commutative, so the
    * aggregate is map-side partial and shard-order-insensitive; md5
    * keeps it engine-reproducible.
    *
    * Scale: one map-side-combined aggregate over the corpus; output is
    * shard-count rows. */
  def shardChecksum(t: Tables, shards: Int = 8): DataFrame =
    t.documents
      .groupBy((col("doc_id") % shards).as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        bit_xor(conv(substring(md5(col("text")), 1, 15), 16, 10).cast("long"))
          .as("content_sig"),
        sum(col("n_chars")).cast("long").as("total_chars"))
      .orderBy(col("shard"))

  /** Deterministic EPOCH SHUFFLE manifests: the data order for every
    * training epoch as a pure function of (epoch, doc_id) — order by
    * md5(epoch_docid) with a doc_id tie-break — so any worker, engine,
    * or restart reproduces byte-identical epoch order with no RNG
    * state to checkpoint. The rank comes from [[globalRowNumber]]
    * (range-repartition + broadcast offsets), which is what makes the
    * manifest scale: a naive global ROW_NUMBER window funnels the
    * corpus through one task, this one never does. The hash sort key
    * also exercises range partitioning on a non-monotonic column —
    * boundaries land mid-hash-space and the offsets must still
    * reconstruct the exact global order. */
  def epochShuffle(t: Tables, epochs: Int = 2): DataFrame = {
    val base = t.documents.select(col("doc_id"))
    (1 to epochs).map { e =>
      val key = md5(concat_ws("_", lit(e), col("doc_id").cast("string")))
      globalRowNumber(base.withColumn("k", key), col("k"), col("doc_id"))
        .select(lit(e.toLong).as("epoch"), col("doc_id"), col("_rn").as("pos"))
    }.reduce(_ unionAll _).orderBy(col("epoch"), col("pos"))
  }

  /** The composed end-to-end training-data pipeline a reference user
    * actually ships: token-length FILTER → MinHash+LSH near-dup DEDUP
    * closed over connected components (min-id survivor) → fixed-length
    * sequence PACK → deterministic train/val/test SPLIT per sequence.
    * Every stage is an individually-oracled kernel (q_corpus_curate's
    * filter, q_dedup_minhash's md5 pair stage, q_dedup_clusters'
    * closure, q_seq_pack's packing, q_split_assign's md5 coin); the
    * composition is one declarative plan — nothing materializes on the
    * driver between stages.
    *
    * Scale: the filter is map-side on the scan; dedup shuffles only
    * skinny band-key and pair-graph frames (Dedup.minhashPairs doc);
    * the closure runs on the pair graph alone; packing reuses the
    * range-partitioned running sum (no corpus-wide window); the split
    * coin is map-side arithmetic on seq_id. */
  def pipelineE2E(t: Tables, seqLen: Long = 512L,
                  minTok: Long = 20L, maxTok: Long = 80L): DataFrame = {
    val filtered = t.documents
      .select(col("doc_id"), col("text"),
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("tok"))
      .filter(col("tok").between(minTok, maxTok))
    val pairs = Dedup.minhashPairs(filtered,
        shingleHash = Dedup.md5Hash31, bandKeyOf = Dedup.bandKeysStr)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val drop = Components.connectedComponents(pairs)
      .filter(col("lbl") =!= col("node")) // survivors keep their own id
      .select(col("node").as("doc_id"))
    val survivors = filtered.select(col("doc_id"), col("tok"))
      .join(drop, Seq("doc_id"), "left_anti")
    val h = conv(substring(md5(col("seq_id").cast("string")), 1, 8), 16, 10)
      .cast("long") % 1000000L
    seqPackSized(survivors, seqLen)
      .withColumn("split",
        when(h < 900000L, "train").when(h < 950000L, "val").otherwise("test"))
      .orderBy(col("seq_id"))
  }

  /** URL canonicalization — the normalization every crawl pipeline
    * runs before URL-level dedup and domain capping (and the reason
    * two spellings of one page don't double-count a domain cap):
    * lowercase scheme+host, strip the scheme's default port, drop the
    * fragment, drop tracking parameters (utm_*, fbclid, gclid), sort
    * the surviving query parameters. The URL is SYNTHESIZED from
    * doc_id (mixed-case scheme/host, varying port, shuffled params —
    * every rule gets exercised), the q_html_extract device: both
    * construction and normalization are string/array expressions, so
    * the operator is fully oracled. Map-side; no shuffle but the
    * presentation sort. */
  def urlCanon(t: Tables): DataFrame = {
    def coin(r: Int): org.apache.spark.sql.Column =
      conv(substring(md5(concat(lit(s"$r:"), col("doc_id").cast("string"))), 1, 8),
        16, 10).cast("long").bitwiseAND(lit(0x7FFFFFFFL))
    val hIdx = (coin(0) % hostPool.length).cast("int")
    val host0 = element_at(array(hostPool.map(lit): _*), hIdx + 1)
    val scheme = when(coin(1) % 2 === 0, lit("HTTP")).otherwise(lit("https"))
    val host = when(coin(2) % 2 === 0, upper(host0)).otherwise(host0)
    val port = element_at(array(lit(80L), lit(443L), lit(8080L)),
      (coin(3) % 3).cast("int") + 1)
    val path = concat(lit("/p"), (col("doc_id") % 7).cast("string"))
    val query = when(coin(4) % 3 === 0, lit("b=2&utm_source=news&a=1"))
      .when(coin(4) % 3 === 1, lit("a=1&fbclid=xyz&b=2"))
      .otherwise(lit(""))
    val frag = when(coin(5) % 2 === 0, lit("#sec1")).otherwise(lit(""))
    val url = concat(scheme, lit("://"), host, lit(":"), port.cast("string"),
      path, when(query =!= "", concat(lit("?"), query)).otherwise(lit("")), frag)
    // —— the canonicalization kernel ——
    val lscheme = lower(regexp_extract(col("url"), "^([A-Za-z]+)://", 1))
    val lhost = lower(regexp_extract(col("url"), "^[A-Za-z]+://([^/:?#]+)", 1))
    val pport = regexp_extract(col("url"), "^[A-Za-z]+://[^/:?#]+:(\\d+)", 1)
    val ppath = regexp_extract(col("url"), "^[A-Za-z]+://[^/?#]+(/[^?#]*)", 1)
    val pquery = regexp_extract(col("url"), "\\?([^#]*)", 1)
    val defaultPort = (lscheme === "http" && pport === "80") ||
      (lscheme === "https" && pport === "443")
    val keepPort = when(pport =!= "" && !defaultPort,
      concat(lit(":"), pport)).otherwise(lit(""))
    val params = filter(split(pquery, "&"), p =>
      length(p) > 0 && !p.startsWith("utm_") &&
        !p.startsWith("fbclid=") && !p.startsWith("gclid="))
    val canonQ = when(size(params) > 0,
      concat(lit("?"), array_join(array_sort(params), "&"))).otherwise(lit(""))
    val canon = concat(lscheme, lit("://"), lhost, keepPort, ppath, canonQ)
    val nDropped = (size(filter(split(pquery, "&"), p => length(p) > 0))
      - size(params)).cast("long")
    t.documents.select(col("doc_id"), url.as("url"))
      .select(col("doc_id"), col("url"), canon.as("canon_url"),
        nDropped.as("dropped_params"))
      .orderBy(col("doc_id"))
  }

  /** C4-style phrase-blocklist filter (Raffel et al. 2020 §2.2: drop
    * any page containing a blocklisted word; generalized here to 1–2
    * word PHRASES, the form real deny-lists take). Per document: how
    * many blocklist phrases occur (distinct and total) and the drop
    * flag. The blocklist is a BROADCAST dimension — a real deny-list
    * is thousands of rows, still broadcast class — joined against the
    * doc's 1/2-gram explode; corpus-sized work is one map-side gram
    * expand + one per-doc aggregate. Zero-hit documents are kept with
    * zeros via the left join (row count stable under any list). */
  val DefaultBlocklist: Seq[String] =
    Seq("dup", "slow scan", "big hash", "stream dup")

  def blocklistFilter(t: Tables,
                      phrases: Seq[String] = DefaultBlocklist): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    val block = broadcast(phrases.toDF("phrase"))
    val toks = graft.functions.TextFunctions.tokens(col("text"))
    val grams = t.documents.select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"), explode(concat(
        graft.functions.TextFunctions.wordNgramsOf(col("toks"), 1),
        graft.functions.TextFunctions.wordNgramsOf(col("toks"), 2))).as("phrase"))
    val hits = grams.join(block, Seq("phrase"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_hits"),
        countDistinct(col("phrase")).cast("long").as("n_phrases"))
    t.documents.select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("n_phrases"), lit(0L)).as("n_phrases"),
        when(col("n_hits").isNotNull, lit(1)).otherwise(lit(0)).as("dropped"))
      .orderBy(col("doc_id"))
  }

  /** HTML boilerplate extraction (jusText-style, Pomikálek 2011's core
    * signal): strip script blocks, split the page into block-tag
    * lines, classify each line by LINK DENSITY + length — a line is
    * content iff it has ≥ 3 words and ≤ half of them inside `<a>`
    * anchors (the 0.5 threshold as the integer cross-product
    * `2·link_words ≤ words`, division-free) — and keep the content
    * lines' text. Navigation bars, footers, and fully-linked
    * paragraphs drop; prose survives.
    *
    * The documents table has no HTML, so the page is SYNTHESIZED
    * deterministically first (nav + script + one `<p>` per 10-word
    * chunk — every (doc_id+chunk)%4==0 paragraph fully linked — +
    * footer), the same device spanCorrupt uses for corruption:
    * construction AND extraction are regexp/array expressions both
    * engines replay, so the whole operator sits under the oracle.
    *
    * Scale: entirely map-side — one projection per document, no
    * shuffle but the final presentation sort; the per-line stats are
    * array HOFs inside codegen. A real crawl feed swaps the synthetic
    * `html` column for the fetched page body and keeps the kernel. */
  def htmlExtract(t: Tables): DataFrame = htmlExtractDocs(t.documents)

  /** [[htmlExtract]] over an explicit (doc_id, text) frame. */
  def htmlExtractDocs(docs: DataFrame): DataFrame = {
    // —— synthesis: words → 10-word <p> chunks, some fully linked ——
    val ws = filter(split(col("text"), " "), w => length(w) > 0)
    val nChunks = ((size(ws) + lit(9)) / lit(10)).cast("int") // (n+9) div 10
    val paras = transform(
      sequence(lit(0), greatest(nChunks, lit(1)) - 1),
      ci => {
        val cw = slice(ws, ci * 10 + 1, lit(10))
        val linked = transform(cw,
          w => concat(lit("<a href=\"#\">"), w, lit("</a>")))
        concat(lit("<p>"),
          array_join(when((col("doc_id") + ci) % 4 === 0, linked)
            .otherwise(cw), " "),
          lit("</p>"))
      })
    val html = concat(
      lit("<div><a href=\"/\">Home</a> <a href=\"/a\">About</a></div>"),
      lit("<script>var x = 1;</script>"),
      array_join(paras, ""),
      lit("<div><a href=\"/tos\">Terms</a></div>"))
    // —— extraction: the actual operator kernel ——
    val noScript = regexp_replace(html, "<script[^<]*</script>", " ")
    val lines = split(noScript, "</p>|</div>")
    val stats = transform(lines, l => {
      val txt = trim(regexp_replace(regexp_replace(l, "<[^>]*>", " "), " +", " "))
      val nw = when(txt === "", lit(0)).otherwise(size(split(txt, " ")))
      val linkTexts = regexp_extract_all(l, lit("<a [^>]*>([^<]*)</a>"), lit(1))
      val lw = aggregate(linkTexts, lit(0),
        (a, s) => {
          val st = trim(regexp_replace(s, " +", " "))
          a + when(st === "", lit(0)).otherwise(size(split(st, " ")))
        })
      struct(nw.as("nw"), lw.as("lw"), txt.as("txt"))
    })
    val nonEmpty = filter(stats, s => s.getField("nw") > 0)
    val content = filter(nonEmpty, s =>
      s.getField("nw") >= 3 && s.getField("lw") * 2 <= s.getField("nw"))
    docs.select(
        col("doc_id"),
        size(nonEmpty).cast("long").as("n_lines"),
        size(content).cast("long").as("n_content"),
        (size(nonEmpty) - size(content)).cast("long").as("n_boiler"),
        aggregate(content, lit(0L), (a, s) => a + s.getField("nw")).as("content_words"),
        aggregate(nonEmpty, lit(0L), (a, s) => a + s.getField("lw")).as("link_words"),
        md5(array_join(transform(content, s => s.getField("txt")), "\n"))
          .as("content_hash"))
      .orderBy(col("doc_id"))
  }

  /** Space-filling-curve LOCALITY AUDIT: Hilbert vs z-order (Morton)
    * positions for the same 2-D bucket grid, compared on the metric
    * that decides skipping quality — how many FILES a rectangular
    * query tile must open, modeling files as fixed-size contiguous
    * curve ranges (what sorting by the curve key and cutting by size
    * produces). The range size (1000 cells) is deliberately NOT a
    * power of two and tiles are OFFSET by half a tile: power-of-two
    * aligned tiles cut at subtree boundaries are contiguous subtrees
    * of BOTH curves (the comparison would be vacuous — measured
    * equal); unaligned ranges and tiles are what real file cuts and
    * predicates look like, and where Morton's quadrant seams cost.
    * Note max−min SPAN is the wrong metric — one far Morton jump can
    * score better than many small Hilbert detours; files-touched is
    * what a scan pays. The spec asserts Hilbert's total wins; the
    * compactHilbert spec shows the write-side dual (tighter per-file
    * bounding boxes on equal-row range cuts).
    *
    * Both kernels replay exactly in DuckDB (pure integer bit
    * arithmetic). Scale: per-row straight-line bit math inside
    * WholeStageCodegen, zero windows/ranks (file id = d DIV 1000 is
    * map-side); the audit agg is one map-side-combined groupBy over
    * ≤81 tiles. */
  def hilbertLocality(t: Tables): DataFrame = {
    import graft.functions.ZOrder
    val bits = 8
    val base = t.lineitem.select(
      (col("l_orderkey") % 256).cast("long").as("x"),
      (col("l_partkey") % 256).cast("long").as("y"))
    ZOrder.withHilbert(base, "x", "y", bits, "h")
      .withColumn("z", ZOrder.interleave(Seq(col("x"), col("y")), bits))
      .withColumn("tile_x", expr("CAST((x + 16) DIV 32 AS BIGINT)"))
      .withColumn("tile_y", expr("CAST((y + 16) DIV 32 AS BIGINT)"))
      .groupBy(col("tile_x"), col("tile_y"))
      .agg(count(lit(1)).cast("long").as("n"),
        countDistinct(expr("h DIV 1000")).cast("long").as("h_files"),
        countDistinct(expr("z DIV 1000")).cast("long").as("z_files"))
      .orderBy(col("tile_x"), col("tile_y"))
  }
}
