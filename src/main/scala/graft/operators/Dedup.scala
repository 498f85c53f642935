package graft.operators

import graft.CacheRegistry.Tracked
import graft.functions.TextFunctions
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline.
  *
  * Scale design: every variant keeps candidate generation an EQUI-join
  * (hash shuffle on a bucket key) — never an O(n²) cross-product. At
  * 100 TB the exact variant is one shuffle on the content hash; MinHash
  * LSH shuffles `bands × n` small rows; verification only touches
  * candidate pairs (a vanishing fraction of n²).
  */
object Dedup {

  /** Single-row-group inputs scan as one task; fan the rows out across
    * the cluster BEFORE the compute-heavy shingle/hash stages — but
    * ONLY when the scan actually under-parallelizes. A 100 TB table
    * already splits into far more tasks than cores, and an
    * unconditional `repartition` there is a full round-robin shuffle
    * of the raw text/vectors for zero benefit, so the fan-out is gated
    * on the input's physical partition count (inspected lazily — no
    * job runs). SpreadSpec pins both directions. */
  private[graft] def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // Gate WITHOUT `.rdd` — that forces a second physical planning of
    // the upstream plan just to read a partition count. An explicit
    // repartition in the logical plan states its count directly; for
    // file scans, estimate splits from the relation's size stat
    // (file-index metadata, no planning). The stat is trusted ONLY
    // when every leaf is a file-backed relation: for in-memory /
    // joined plans, stats fall back to defaultSizeInBytes-style
    // over-estimates, and an OVER-estimate is the harmful direction
    // here — it wrongly skips the fan-out and leaves a narrow input
    // serial. Unknown size ⇒ treat as narrow and repartition: the
    // worst case of that choice is one redundant round-robin shuffle
    // on an already-wide input, vs a serial stage on 32 cores.
    val declared = df.queryExecution.logical.collectFirst {
      case r: org.apache.spark.sql.catalyst.plans.logical.RepartitionOperation =>
        BigInt(r.numPartitions)
    }
    val estimated = declared.getOrElse {
      val optimized = df.queryExecution.optimizedPlan
      val fileBacked = optimized.collectLeaves().nonEmpty &&
        optimized.collectLeaves().forall {
          case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            l.relation.isInstanceOf[
              org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          case _ => false
        }
      if (!fileBacked) BigInt(0)
      else {
        val maxPart = df.sparkSession.sessionState.conf.filesMaxPartitionBytes
        optimized.stats.sizeInBytes / maxPart
      }
    }
    if (estimated >= target) df
    else df.repartition(target)
  }

  /** Exact dedup: group by content hash, keep the min-id survivor.
    * One shuffle on a 128-bit hash, partial-agg map-side. */
  def exact(t: Tables): DataFrame =
    t.documents
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("survivor_id"), count(lit(1)).as("n_copies"))
      .select(col("survivor_id"), col("content_hash"), col("n_copies"))
      .orderBy(col("survivor_id"))

  /** Block-level exact dedup (RefinedWeb-style "remove repeated
    * passages"): each document is cut into consecutive `block`-token
    * blocks map-side (struct array → explode, no shuffle before the
    * hash), the FIRST occurrence of every distinct block survives
    * (global min over (doc_id, block_idx) — deterministic, no
    * window), and the per-document report counts kept vs dropped
    * blocks. Two shuffles, both on the 128-bit block hash: the
    * arg-min aggregate and the count-back join; per-doc totals then
    * reduce on doc_id. Integer counts + one final division. */
  def blockDedup(t: Tables, block: Int = 20): DataFrame = {
    val blocks = spread(t.documents.select(col("doc_id"), col("text")))
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), ceil(size(col("toks")) / lit(block.toDouble)).cast("int") - 1),
        b => struct(b.cast("long").as("b_idx"),
          md5(concat_ws(" ", slice(col("toks"), b * lit(block) + 1, lit(block)))).as("h")))).as("x"))
      .select(col("doc_id"), col("x.b_idx").as("b_idx"), col("x.h").as("h"))
    val firsts = blocks.groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("b_idx"))).as("first"))
    blocks.join(firsts, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(when(struct(col("doc_id"), col("b_idx")) === col("first"), 1L)
          .otherwise(0L)).as("n_kept"))
      .withColumn("n_dropped", col("n_blocks") - col("n_kept"))
      .withColumn("kept_frac", col("n_kept").cast("double") / col("n_blocks"))
      .orderBy(col("doc_id"))
  }

  /** Distinct word-n-gram shingle set of a text column. */
  def shingles(text: Column, n: Int = 3): Column =
    array_distinct(TextFunctions.wordNgrams(text, n))

  /** (doc_id, sh) frame with the token array materialized in its own
    * projection before the n-gram HOF — see TextFunctions.wordNgramsOf
    * for why the two-step shape is ~6x faster. */
  def shingled(docs: DataFrame, n: Int): DataFrame =
    spread(docs.select(col("doc_id"), col("text")))
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        array_distinct(TextFunctions.wordNgramsOf(col("toks"), n)).as("sh"))

  /** MinHash signatures for a (doc_id, sh: array<string>) frame.
    *
    * Shape matters: higher-order functions (`transform`) are interpreted
    * in Spark, so 64 × transform-per-row is orders slower than codegen.
    * Instead: explode shingles and take `numPerm` codegen'd
    * `min((a_i·h + b_i) mod p)` aggregates — partial aggregation
    * collapses each scan partition to one 64-slot row per doc before the
    * shuffle, so network cost is |docs| × 64 longs no matter how big the
    * shingle explosion is. */
  val P31 = 2147483647L // 2^31 - 1, prime modulus of the universal family

  /** Permutation constants of the universal hash family, shared by the
    * Spark kernel AND the oracle-SQL generator (SparkEntry bakes the
    * same integers into a VALUES list) so both engines run identical
    * integer arithmetic. Fixed seed → reproducible index. */
  def mixConstants(numPerm: Int): Seq[(Long, Long)] = {
    val rng = new scala.util.Random(1234)
    Seq.fill(numPerm)(
      (1L + rng.nextLong().abs % (P31 - 1), rng.nextLong().abs % P31))
  }

  /** Fast 31-bit shingle hash (xxhash64 folded) — the throughput path. */
  def xxHash31(g: Column): Column =
    xxhash64(g).bitwiseAND(lit(0x7FFFFFFFL))

  /** Cross-engine-reproducible 31-bit shingle hash: first 8 hex chars
    * of md5, parsed base-16, folded to 31 bits. DuckDB computes the
    * identical value as `('0x' || substr(md5(g),1,8))::BIGINT &
    * 2147483647`, which is what lets the WHOLE MinHash+LSH pipeline —
    * not just its verify step — be hash-compared against the oracle. */
  def md5Hash31(g: Column): Column =
    conv(substring(md5(g), 1, 8), 16, 10).cast("long")
      .bitwiseAND(lit(0x7FFFFFFFL))

  def minhashSignatures(sh: DataFrame, numPerm: Int,
                        shingleHash: Column => Column = xxHash31): DataFrame = {
    // one string hash per shingle, then the classic universal family
    // h_i(x) = (a_i·x + b_i) mod p per permutation: long multiplies
    // instead of string rehashes. The mod p is ESSENTIAL — without it
    // a_i·x + b_i is monotonic in x, every "permutation" elects the same
    // global-min shingle, and signature slots stop being independent
    // (caught by MinhashEstimationSpec). Operands stay in a 31-bit
    // domain (a·h < 2^62) because Spark 4's default ANSI mode throws on
    // long overflow — wrapping-multiply mixing is off the table.
    val mins = mixConstants(numPerm).zipWithIndex.map { case ((a, b), i) =>
      min((col("h") * lit(a) + lit(b)) % lit(P31)).as(s"m$i")
    }
    sh.select(col("doc_id"), explode(col("sh")).as("g"))
      .select(col("doc_id"), shingleHash(col("g")).as("h"))
      .groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until numPerm).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** LSH band keys: signature sliced into `bands` bands of `rowsPerBand`,
    * each band hashed to one 64-bit bucket key. Docs sharing any band
    * bucket become candidates (equi-join on (band, key)). */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map(b =>
      struct(lit(b).as("band"),
        xxhash64(slice(sig, b * rowsPerBand + 1, rowsPerBand)).as("key"))): _*)

  /** Structural band keys: the slot values themselves, joined into a
    * string — no second-level hash, so the oracle can rebuild the
    * identical key with `array_to_string(list(m ORDER BY i), ',')`.
    * Slightly wider rows than the hashed key (4 longs as text vs one
    * long) but the band join stays a skinny equi-join. */
  def bandKeysStr(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map(b =>
      struct(lit(b).as("band"),
        array_join(transform(slice(sig, b * rowsPerBand + 1, rowsPerBand),
          _.cast("string")), ",").as("key"))): _*)

  /** MinHash+LSH near-duplicate pairs, verified with exact Jaccard on
    * the shingle sets. Returns (doc_a, doc_b, jaccard) with
    * jaccard >= `threshold`.
    *
    * `maxBucket` is the GIANT-BUCKET GUARD for boilerplate-heavy
    * corpora: a band bucket holding B docs emits B·(B−1)/2 candidate
    * pairs, so one boilerplate string duplicated across 0.1% of a
    * 100 TB corpus (B ≈ 10⁶) would alone emit ~5·10¹¹ pairs — AQE's
    * skew split parallelizes that partition (DedupSkewSpec proves the
    * split fires on the band join) but cannot shrink the quadratic
    * output. Buckets larger than `maxBucket` are therefore dropped
    * from pairwise generation: their members are near-identical mass
    * duplicates that the exact/cluster path (q_dedup_exact,
    * nearDupSurvivors' closure over the surviving pairs) already
    * handles without pairwise expansion. A dropped doc can still pair
    * through any of its other (bands−1) band keys whose buckets are
    * below the cap — but a NEAR-copy of a mass-duplicated doc tends to
    * collide with the cluster in every band it shares, so its pairs go
    * down with the capped bucket, and the exact-dedup fallback only
    * recovers byte-identical copies. The cap is the recall/cost trade
    * standard to LSH dedup, not a free filter.
    * The bucket-size filter is one map-side-partial count on the
    * band-key frame joined back on the same key the self-join shuffles
    * on — no extra corpus scan. Default Int.MaxValue = no cap and a
    * byte-identical plan to the uncapped shape. */
  def minhashPairs(docs: DataFrame, numPerm: Int = 32, bands: Int = 8,
                   threshold: Double = 0.5, shingleN: Int = 3,
                   shingleHash: Column => Column = xxHash31,
                   bandKeyOf: (Column, Int, Int) => Column = bandKeys,
                   maxBucket: Int = Int.MaxValue): DataFrame = {
    val rowsPerBand = numPerm / bands
    // NOTE no size>0 filter here: a predicate on the computed column
    // gets pushed below the repartition by PushDownPredicates and then
    // re-evaluates the whole shingle expression on the unspread (single
    // task) side — measured 7x slower. Empty shingle sets are harmless:
    // explode() drops them, so they can never become candidates.
    val sh = shingled(docs, shingleN)
      .persistTracked() // reused by candidate generation AND both verify joins
    // Candidate generation is SKINNY: only (doc_id, band-bucket) rows go
    // through the self-join shuffle — ~16 longs/doc, not the shingle
    // arrays. At 100 TB that's the difference between shuffling ~1% of
    // the corpus and shuffling 16 copies of it.
    val bandedAll = minhashSignatures(sh, numPerm, shingleHash)
      .select(col("doc_id"),
        explode(bandKeyOf(col("sig"), bands, rowsPerBand)).as("bk"))
      .persistTracked() // self-joined: compute signatures once, not twice
    lshVerifiedPairs(sh, bandedAll, threshold, maxBucket)
  }

  /** Band-bucket self-join candidate generation with the optional
    * giant-bucket cap — the shared first half of EVERY LSH verify
    * predicate (Jaccard, containment), factored out so the cap
    * (essential against B²/2 candidate blowup on boilerplate-heavy
    * corpora at the 100 TB target) guards each of them identically.
    * `bandedAll` is the exploded (doc_id, bk) frame; returns distinct
    * candidate pairs with doc_a < doc_b. */
  private def bandCandidates(bandedAll: DataFrame, maxBucket: Int): DataFrame = {
    val banded =
      if (maxBucket == Int.MaxValue) bandedAll
      else bandedAll.join(
        bandedAll.groupBy(col("bk")).agg(count(lit(1)).as("_bn"))
          .filter(col("_bn") <= maxBucket).select(col("bk")),
        Seq("bk")) // skinny (bk) frame, same join key the self-join shuffles on
    banded.select(col("doc_id").as("doc_a"), col("bk"))
      .join(banded.select(col("doc_id").as("doc_b"), col("bk")), Seq("bk"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
  }

  /** Shared LSH tail: band-bucket self-join candidate generation (with
    * the optional giant-bucket cap) verified by exact Jaccard over the
    * shingle sets. Factored out so every signature scheme (classic
    * universal-family MinHash, one-permutation MinHash) runs the
    * identical candidate/verify machinery — only the signature stage
    * differs. `sh` must be the persisted (doc_id, sh) frame the
    * signatures were computed from; `bandedAll` the exploded
    * (doc_id, bk) band-key frame. */
  private def lshVerifiedPairs(sh: DataFrame, bandedAll: DataFrame,
                               threshold: Double, maxBucket: Int): DataFrame = {
    val cand = bandCandidates(bandedAll, maxBucket)
    // Verify step touches only candidates: join the shingle sets back by
    // id (equi-joins) and compute exact Jaccard on the pair.
    cand
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** The oracled MinHash instance: same LSH pipeline end-to-end
    * (shingle → 31-bit hash → universal-family signature → band
    * equi-join → exact-Jaccard verify), but with the md5-derived
    * shingle hash and structural band keys so DuckDB reproduces every
    * intermediate integer exactly. xxHash31/bandKeys stay the
    * throughput variant used by nearDupSurvivors. */
  def minhash(t: Tables): DataFrame =
    minhashPairs(t.documents, shingleHash = md5Hash31, bandKeyOf = bandKeysStr)

  /** The throughput MinHash instance — xxhash64 shingle hashing and
    * hashed band keys, the kernels a 100 TB run ships (and what
    * nearDupSurvivors composes). Not SQL-oracled (xxhash64 has no
    * DuckDB twin); correctness is pinned by DedupSpec and by the md5
    * twin above sharing every stage but the hash family. Registered as
    * its own bench query so regressions in the production path stay
    * visible next to the oracle-parity variant. */
  def minhashFast(t: Tables): DataFrame = minhashPairs(t.documents)

  /** The CAPPED oracled MinHash instance: identical to [[minhash]] but
    * with the giant-bucket guard engaged at `maxBucket = 2`, small
    * enough to bite on the test corpus's real dup clusters (bucket
    * size 3+ exists at sf0.01) so the guard's semantics — not just its
    * default-off path — sit under the DuckDB gate. The oracle rebuilds
    * the same bucket-size filter from the shared band-key CTE. A
    * production run sets the cap orders of magnitude higher (10³–10⁴);
    * the SEMANTICS of "drop pairwise generation inside oversized
    * buckets" is what this query pins. */
  def minhashCap(t: Tables): DataFrame =
    minhashPairs(t.documents, shingleHash = md5Hash31,
      bandKeyOf = bandKeysStr, maxBucket = 2)

  /** One-permutation-hashing MinHash signatures (Li, Owen, Zhang,
    * NeurIPS 2012) with rotation densification (Shrivastava & Li,
    * ICML 2014 shape): instead of evaluating `numPerm` universal-family
    * hashes per shingle, each shingle's ONE hash value is routed to bin
    * `h mod numPerm` and each bin keeps its min. Empty bins borrow from
    * the nearest non-empty bin to their right (circularly), offset by
    * `d · P31` so borrowed slots can never collide with a genuine min
    * from another doc's same bin.
    *
    * The scale adjudication (measured, BENCH_SCALING r11): OPH's
    * literature win assumes signature cost = numPerm FULL hashes of
    * each shingle. [[minhashSignatures]] already hashes each shingle
    * ONCE and applies numPerm cheap universal-family mixes inside
    * codegen — it is already "one-permutation" in string-hash cost —
    * so this kernel measures within ~10% of the classic one at 10×
    * data (1.42 s vs 1.29 s, xxhash twins). The operator earns its
    * place as the standard OPH surface (engines whose per-permutation
    * cost IS a rehash need it; ours gets estimation-property parity
    * and an oracled reference implementation), not as a speedup here.
    *
    * Estimation quality: a k-bin OPH sketch estimates Jaccard with the
    * same variance as k classic permutations on sets ≫ k; the verify
    * stage computes EXACT Jaccard anyway, so scheme choice only moves
    * candidate recall, not emitted-pair precision. */
  def ophSignatures(sh: DataFrame, numPerm: Int,
                    shingleHash: Column => Column = xxHash31): DataFrame = {
    // Shape matters (same lesson as minhashSignatures): everything
    // stays inside whole-stage codegen. Per-bin minima are `numPerm`
    // CONDITIONAL min aggregates over one exploded pass — one shuffle
    // on doc_id, map-side partials, identical wire shape to the
    // classic kernel — and rotation densification unrolls at PLAN time
    // into a coalesce chain per slot (slot k = first non-null among
    // m[(k+d)%numPerm] + d·P31, d ascending). A first cut built a
    // (bin→min) map and densified with nested filter/transform HOFs:
    // interpreted lambdas, a second shuffle, and measured SLOWER than
    // the classic kernel at 10× data — the numPerm² coalesce branches
    // compile once and run at codegen speed instead. */
    val mins = (0 until numPerm).map(i =>
      min(when(col("bin") === i, col("h"))).as(s"m$i"))
    sh.select(col("doc_id"), explode(col("sh")).as("g"))
      .select(col("doc_id"), shingleHash(col("g")).as("h"))
      .withColumn("bin", (col("h") % numPerm).cast("int"))
      .groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until numPerm).map { k =>
          coalesce((0 until numPerm).map { d =>
            col(s"m${(k + d) % numPerm}") + lit(d.toLong * P31)
          }: _*)
        }: _*).as("sig"))
  }

  /** MinHash+LSH near-dup pairs over OPH signatures — identical
    * candidate/verify tail to [[minhashPairs]], one-pass signature
    * stage. Same output contract: (doc_a, doc_b, jaccard >= threshold). */
  def ophPairs(docs: DataFrame, numPerm: Int = 32, bands: Int = 8,
               threshold: Double = 0.5, shingleN: Int = 3,
               shingleHash: Column => Column = xxHash31,
               bandKeyOf: (Column, Int, Int) => Column = bandKeys,
               maxBucket: Int = Int.MaxValue): DataFrame = {
    val sh = shingled(docs, shingleN).persistTracked()
    val bandedAll = ophSignatures(sh, numPerm, shingleHash)
      .select(col("doc_id"),
        explode(bandKeyOf(col("sig"), bands, numPerm / bands)).as("bk"))
      .persistTracked()
    lshVerifiedPairs(sh, bandedAll, threshold, maxBucket)
  }

  /** The oracled OPH instance: md5 shingle hash + structural band keys
    * so DuckDB rebuilds every intermediate integer — bin routing,
    * per-bin minima, the rotation-densified slots (`m + d·P31`), band
    * keys, and the exact-Jaccard verify. */
  def minhashOph(t: Tables): DataFrame =
    ophPairs(t.documents, shingleHash = md5Hash31, bandKeyOf = bandKeysStr)

  /** The throughput OPH instance (xxhash64 shingles + hashed band
    * keys) — the kernel a 100 TB run ships, where the md5 oracle
    * hash's cost no longer masks the numPerm× signature-stage saving.
    * Benched beside q_dedup_minhash_fast so the classic-vs-OPH CPU
    * delta stays visible on the production hash family; semantics
    * pinned by the oracled md5 twin above. */
  def ophFast(t: Tables): DataFrame = ophPairs(t.documents)

  /** Overlap-coefficient (Szymkiewicz–Simpson) near-containment pairs:
    * |A∩B| / min(|A|,|B|) over the SAME md5 LSH candidate set as
    * [[minhash]]. Symmetric Jaccard misses doc-inside-doc inclusion (a
    * 50-shingle quote embedded in a 5000-shingle page has Jaccard 0.01
    * but overlap 1.0); this surfaces those pairs among band-collision
    * candidates. Candidate RECALL is still Jaccard-tuned — a pair with
    * high containment but near-zero Jaccard rarely collides in a band,
    * which is the documented trade of reusing the one LSH index rather
    * than maintaining a second containment-tuned index (the 100 TB
    * deployment answer: one index, two verify predicates). */
  def containmentPairs(docs: DataFrame, threshold: Double = 0.5,
                       shingleN: Int = 3,
                       maxBucket: Int = Int.MaxValue): DataFrame = {
    val sh = shingled(docs, shingleN).persistTracked()
    val bandedAll = minhashSignatures(sh, 32, md5Hash31)
      .select(col("doc_id"),
        explode(bandKeysStr(col("sig"), 8, 4)).as("bk"))
      .persistTracked() // self-joined: compute signatures once, not twice
    val cand = bandCandidates(bandedAll, maxBucket)
    cand
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .withColumn("overlap",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          least(size(col("sh_a")), size(col("sh_b"))))
      .filter(col("overlap") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("overlap"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  def containment(t: Tables): DataFrame = containmentPairs(t.documents)

  /** Chunk-bucketed Hamming pairs over a (doc_id, fp) frame: candidates
    * = equal `chunkBits`-bit chunk (Hamming ≤ maxHamming < nChunks
    * guarantees ≥1 equal chunk by pigeonhole, so the bucketed join is
    * EXACTLY the brute-force all-pairs result — that identity is what
    * the oracle checks), verified by exact popcount of the XOR. */
  private def hammingPairs(fp: DataFrame, nChunks: Int, chunkBits: Int,
                           maxHamming: Int): DataFrame = {
    require(maxHamming < nChunks, "pigeonhole needs maxHamming < nChunks")
    val mask = (1L << chunkBits) - 1
    val chunked = fp.select(col("doc_id"), col("fp"),
      explode(array((0 until nChunks).map(i =>
        struct(lit(i).as("chunk"),
          shiftright(col("fp"), i * chunkBits).bitwiseAND(lit(mask)).as("bits"))): _*)).as("ck"))
      .persistTracked() // self-joined: hash each doc once
    val a = chunked.select(col("doc_id").as("doc_a"), col("fp").as("fp_a"), col("ck"))
    val b = chunked.select(col("doc_id").as("doc_b"), col("fp").as("fp_b"), col("ck"))
    a.join(b, a("ck") === b("ck") && col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("fp_a"), col("fp_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** SimHash near-dup, throughput variant: 64-bit fingerprint per doc
    * (custom codegen'd FNV-vote expression), 4 × 16-bit chunks. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame =
    hammingPairs(
      spread(docs.select(col("doc_id"), col("text")))
        .select(col("doc_id"),
          graft.functions.HashFunctions.simhash64(graft.functions.TextFunctions.tokens(col("text"))).as("fp")),
      nChunks = 4, chunkBits = 16, maxHamming = maxHamming)

  /** Cross-engine-reproducible 60-bit SimHash: per token, the first 15
    * md5 hex nibbles are the token's hash bits; bit j of the
    * fingerprint is the sign of Σ_tokens (±1 by bit j of the token
    * hash). 60 bits (not 64) keeps every intermediate in non-negative
    * BIGINT range on both engines. Same per-bit-vote semantics as the
    * FNV simhash64 kernel; only the token-hash family differs. */
  def simhashMd5Fingerprints(docs: DataFrame): DataFrame = {
    // 15 nibble columns materialized once per token, then the per-bit
    // set-counts aggregated as 15 LANE-PACKED sums (each nibble's 4
    // bit-counts ride in 16-bit lanes of one long) + one token count —
    // 16 aggregate expressions instead of 60 conditional sums, still
    // fully codegen'd with map-side partial aggregation collapsing each
    // partition to one row per doc before the shuffle. Lanes can't
    // overflow below 65536 tokens per document. The sign vote
    // `sum(±1) > 0` is recovered as `2·count_set > n_tokens`
    // (identical, including the tie → 0 case).
    val nib = spread(docs.select(col("doc_id"), col("text")))
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("tk"))
      .select(col("doc_id"), md5(col("tk")).as("m"))
      .select(col("doc_id") +: (0 until 15).map(c =>
        conv(substring(col("m"), c + 1, 1), 16, 10).cast("int").as(s"n$c")): _*)
    val packs = (0 until 15).map { c =>
      sum((0 until 4).map(b =>
          shiftleft(shiftright(col(s"n$c"), b).bitwiseAND(lit(1)).cast("long"), 16 * b))
        .reduce(_ + _)).as(s"p$c")
    }
    val fp = (0 until 60).map { j =>
      val cnt = shiftright(col(s"p${j / 4}"), 16 * (j % 4)).bitwiseAND(lit(0xFFFFL))
      when(cnt * 2 > col("ntok"), lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    nib.groupBy(col("doc_id"))
      .agg(packs.head, (packs.tail :+ count(lit(1)).as("ntok")): _*)
      .select(col("doc_id"), fp.as("fp"))
  }

  /** The oracled SimHash instance: md5-nibble fingerprints, 4 × 15-bit
    * pigeonhole chunks. DuckDB's oracle computes the identical
    * fingerprints and brute-forces all pairs — equality with this
    * bucketed join is guaranteed, not sampled. */
  def simhashPairsMd5(docs: DataFrame, maxHamming: Int = 3): DataFrame =
    hammingPairs(simhashMd5Fingerprints(docs),
      nChunks = 4, chunkBits = 15, maxHamming = maxHamming)

  def simhash(t: Tables): DataFrame = simhashPairsMd5(t.documents)

  /** FNV-64 variant retained under its own name for specs/perf work. */
  def simhashFnv(t: Tables): DataFrame = simhashPairs(t.documents)

  /** Embedding-cosine near-dup: random-hyperplane LSH (sign-bit
    * sketches). `nTables` independent tables; bits per table SCALE
    * with corpus size — `ceil(log2(n / targetBucket))` — so bucket
    * occupancy stays ~`targetBucket` rows no matter how big the corpus
    * is (a fixed bit width means candidates grow O(n²/2^bits): fine at
    * one SF, quadratic at the next). The recall the extra bits cost is
    * bought back by MULTI-PROBE: each vector also probes the `bits`
    * buckets at Hamming distance 1 from its own, so a pair collides in
    * a table when their sketches differ in ≤1 bit. Candidates stay an
    * equi-join on (table, bucket) — probes × targetBucket rows per
    * vector per table, linear in n — and exact cosine verifies. */
  def embedPairs(emb: DataFrame, nTables: Int = 8, bitsPerTable: Int = 0,
                 threshold: Double = 0.35, dim: Int = 64,
                 targetBucket: Int = 64): DataFrame = {
    val base = spread(emb.select(col("vec_id"), col("embedding")))
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      .persistTracked()
    val bits = if (bitsPerTable > 0) bitsPerTable else {
      // parquet metadata count — no scan. ceil(log2(x)) = 64 - nlz(x-1).
      val buckets = math.max(1L, emb.count() / targetBucket)
      math.min(16, math.max(4, 64 - java.lang.Long.numberOfLeadingZeros(buckets - 1)))
    }
    val rng = new scala.util.Random(42) // fixed seed: index is reproducible
    val planes: Array[Array[Array[Double]]] =
      Array.fill(nTables, bits)(Array.fill(dim)(rng.nextGaussian()))
    // all nTables×bits sign-bit dots in ONE kernel pass per row (the
    // per-plane DotProduct spelling unpacked the vector 32×per row)
    val bucketed = base.select(col("vec_id"),
        posexplode(graft.functions.VectorFunctions.hyperplaneSketch(col("v"), planes)))
      .select(col("vec_id"), col("pos").as("table"), col("col").as("bucket"))
      .persistTracked()
    // probe side: own bucket + every 1-bit flip. Only ONE side expands
    // (id_a); pair symmetry of Hamming distance covers the other.
    val probes = bucketed.select(col("vec_id").as("id_a"), col("table"),
      explode(array(col("bucket") +: (0 until bits).map(j =>
        col("bucket").bitwiseXOR(lit(1L << j))): _*)).as("bucket"))
    val cand = probes
      .join(bucketed.select(col("vec_id").as("id_b"), col("table"), col("bucket")),
        Seq("table", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    // verify with norms precomputed per VECTOR, not per pair: the float
    // op sequence (dot / (sqrt(aa)*sqrt(bb))) is unchanged, so results
    // stay bit-identical to GraftVec.cosine
    val withNorm = base.withColumn("nrm", sqrt(Similarity.dot(col("v"), col("v"))))
    cand
      .join(withNorm.select(col("vec_id").as("id_a"), col("v").as("va"), col("nrm").as("na")), Seq("id_a"))
      .join(withNorm.select(col("vec_id").as("id_b"), col("v").as("vb"), col("nrm").as("nb")), Seq("id_b"))
      .withColumn("cos", Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
      .orderBy(col("id_a"), col("id_b"))
  }

  def embedDedup(t: Tables): DataFrame = embedPairs(t.embeddings)

  /** Rademacher (±1) hyperplanes derived from md5(table_plane_dim)
    * parity — the same first-8-hex-chars integer DuckDB's md5 yields,
    * so an oracle can rebuild every plane bit-for-bit. Sign-sketch
    * quality of ±1 planes matches Gaussian planes for LSH (Achlioptas
    * 2003: database-friendly random projections); determinism is what
    * the Gaussian kernel can't give an oracle. Dim index is 1-based to
    * line up with DuckDB's generate_subscripts. */
  def md5Planes(nTables: Int, bits: Int, dim: Int): Array[Array[Array[Double]]] =
    Array.tabulate(nTables, bits) { (t, p) =>
      Array.tabulate(dim) { d0 =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(s"${t}_${p}_${d0 + 1}".getBytes("UTF-8"))
        val h = java.lang.Long.parseLong(md.take(4).map(b => f"$b%02x").mkString, 16)
        if (h % 2 == 0) 1.0 else -1.0
      }
    }

  /** ORACLED embedding-cosine LSH: the [[embedPairs]] shape with every
    * nondeterminism removed so DuckDB can replay the full index build —
    * md5-derived ±1 hyperplanes ([[md5Planes]]), vectors snapped to
    * exact micro-ints first (so every sketch dot is integer-exact in
    * doubles: |sum| ≤ 64·10⁶ ≪ 2⁵³ and the sign decision can never
    * split engines), exact-bucket candidates (no multiprobe), and the
    * integer-exact cosine-ppm verify shared with
    * [[embedDedupExactPairs]].
    *
    * This pins the semantics; [[embedPairs]] (`q_dedup_embed_mp`)
    * stays the production kernel — Gaussian planes, corpus-scaled bit
    * width, multiprobe recall. The oracled instance fixes
    * nTables×bits at 8×6 for the driver corpus; a 100 TB run scales
    * bits with log n exactly as embedPairs does (fixed-width buckets
    * are the classic LSH quadratic-candidate trap). */
  def embedPairsMd5(emb: DataFrame, nTables: Int = 8, bits: Int = 6,
                    thresholdPpm: Long = 300000L): DataFrame = {
    val planes = md5Planes(nTables, bits, 64)
    val base = spread(emb.select(col("vec_id"), col("embedding")))
      .select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * 1000000d + 0.5d).cast("double")).as("m"))
      .withColumn("aa", graft.functions.VectorFunctions
        .dotProduct(col("m"), col("m")).cast("long"))
      .persistTracked()
    val bucketed = base.select(col("vec_id"),
        posexplode(graft.functions.VectorFunctions.hyperplaneSketch(col("m"), planes)))
      .select(col("vec_id"), col("pos").as("table"), col("col").as("bucket"))
    val cand = bucketed.select(col("vec_id").as("id_a"), col("table"), col("bucket"))
      .join(bucketed.select(col("vec_id").as("id_b"), col("table"), col("bucket")),
        Seq("table", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    cand
      .join(base.select(col("vec_id").as("id_a"), col("m").as("ma"), col("aa")), Seq("id_a"))
      .join(base.select(col("vec_id").as("id_b"), col("m").as("mb"),
        col("aa").as("bb")), Seq("id_b"))
      .withColumn("dot", graft.functions.VectorFunctions
        .dotProduct(col("ma"), col("mb")).cast("long"))
      .withColumn("cos_ppm", expr(cosPpmSql))
      .filter(col("cos_ppm") >= thresholdPpm)
      .select(col("id_a"), col("id_b"), col("cos_ppm"))
      .orderBy(col("id_a"), col("id_b"))
  }

  def embedDedupMd5(t: Tables): DataFrame = embedPairsMd5(t.embeddings)

  /** INCREMENTAL near-dup dedup — the daily-increment shape: probe a
    * NEW batch of documents against the EXISTING corpus index instead
    * of self-joining the whole corpus. Candidates are an asymmetric
    * equi-join of the batch's band keys against the index's (the
    * index side is precomputed once in a real deployment and only the
    * batch's signatures are fresh work), so incremental cost is
    * O(batch), not O(corpus) — re-running the full self-join every day
    * is the classic dedup-at-scale mistake. Exact-Jaccard verify on
    * the candidate pairs only, like [[minhashPairs]]. The driver
    * instance partitions by doc_id decile (every 10th doc is "new");
    * a deployment passes its real batch/index frames. */
  def minhashIncremental(t: Tables, threshold: Double = 0.5): DataFrame = {
    val sh = shingled(t.documents, 3).persistTracked()
    val banded = minhashSignatures(sh, 32, md5Hash31)
      .select(col("doc_id"), explode(bandKeysStr(col("sig"), 8, 4)).as("bk"))
      .persistTracked()
    val cand = banded.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id").as("new_doc"), col("bk"))
      .join(banded.filter(col("doc_id") % 10 =!= 0)
        .select(col("doc_id").as("dup_of"), col("bk")), Seq("bk"))
      .select(col("new_doc"), col("dup_of")).distinct()
    cand
      .join(sh.select(col("doc_id").as("new_doc"), col("sh").as("sh_a")), Seq("new_doc"))
      .join(sh.select(col("doc_id").as("dup_of"), col("sh").as("sh_b")), Seq("dup_of"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("new_doc"), col("dup_of"), col("jaccard"))
      .orderBy(col("new_doc"), col("dup_of"))
  }

  /** ANN RECALL AUDIT: the embedding counterpart of [[lshAudit]] —
    * for a deterministic md5-coin sample of vectors, compare the LSH
    * index's candidate pairs ([[embedPairsMd5]]'s bucketing) against
    * EXACT all-pairs ground truth at the same cosine threshold, banded
    * by cosine decile. The dashboard that says "at this bit width the
    * index finds 9x% of ≥0.9 pairs but only y% of 0.3-0.4 pairs" —
    * what an operator must know before trusting LSH dedup at 100 TB.
    *
    * Ground truth is all-pairs and therefore quadratic BY DEFINITION —
    * that is why the audit contract samples first (`samplePpm` on an
    * md5 coin, engine-independent): recall estimated on a bounded
    * sample is the standard ANN-benchmark practice. The sampled base
    * is small, so the quadratic side never touches the full corpus.
    * LSH candidates are recomputed on the same sample (recall within
    * the sample, unbiased for bucketing behavior). */
  def annRecall(t: Tables, samplePpm: Long = 250000L,
                thresholdPpm: Long = 300000L): DataFrame = {
    val coin = conv(substring(md5(col("vec_id").cast("string")), 1, 8), 16, 10)
      .cast("long") % 1000000L
    val samp = t.embeddings.filter(coin < samplePpm)
      .select(col("vec_id"), col("embedding"))
    val base = spread(samp)
      .select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * 1000000d + 0.5d).cast("double")).as("m"))
      .withColumn("aa", graft.functions.VectorFunctions
        .dotProduct(col("m"), col("m")).cast("long"))
      .persistTracked()
    val truth = base.select(col("vec_id").as("id_a"), col("m").as("ma"), col("aa"))
      .join(base.select(col("vec_id").as("id_b"), col("m").as("mb"), col("aa").as("bb")),
        col("id_a") < col("id_b"))
      .withColumn("dot", graft.functions.VectorFunctions
        .dotProduct(col("ma"), col("mb")).cast("long"))
      .withColumn("cos_ppm", expr(cosPpmSql))
      .filter(col("cos_ppm") >= thresholdPpm)
      .select(col("id_a"), col("id_b"), col("cos_ppm"))
    val planes = md5Planes(8, 6, 64)
    val bucketed = base.select(col("vec_id"),
        posexplode(graft.functions.VectorFunctions.hyperplaneSketch(col("m"), planes)))
      .select(col("vec_id"), col("pos").as("table"), col("col").as("bucket"))
    val cand = bucketed.select(col("vec_id").as("id_a"), col("table"), col("bucket"))
      .join(bucketed.select(col("vec_id").as("id_b"), col("table"), col("bucket")),
        Seq("table", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
      .withColumn("hit", lit(1L))
    truth.join(cand, Seq("id_a", "id_b"), "left")
      .groupBy(expr("cos_ppm DIV 100000").as("band"))
      .agg(count(lit(1)).as("n_true"),
        sum(coalesce(col("hit"), lit(0L))).cast("long").as("n_found"))
      .withColumn("recall_ppm", expr("n_found * 1000000 DIV n_true"))
      .orderBy(col("band"))
  }

  def annRecallAudit(t: Tables): DataFrame = annRecall(t)

  /** Boilerplate LINE dedup (CCNet / RefinedWeb): drop text segments
    * that recur across ≥ `minDf` distinct documents — navigation bars,
    * cookie banners, licence footers — independent of any pairwise
    * document similarity. The corpus has no newlines, so a "line" is a
    * non-overlapping `segLen`-token window; the semantics (hash each
    * line, count distinct docs, drop common lines, report per-doc
    * residue) are exactly CCNet's paragraph-frequency filter.
    *
    * Scale: one segment aggregate (map-side partial on the segment
    * key), the join back rides the agg's partitioning, then one
    * per-doc aggregate — segments cross the wire once. The oracled
    * instance keys on the raw segment text; a 100 TB run keys on a
    * 128-bit fingerprint of it (same plan, skinnier shuffle — CCNet
    * ships sha1 prefixes for the same reason). */
  def lineDedup(t: Tables, segLen: Int = 10, minDf: Long = 3L): DataFrame = {
    val segs = spread(t.documents.select(col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("l")))
      // empty token arrays must not reach the sequence: sequence(0,-1)
      // auto-descends and would emit rows where the oracle's
      // generate_series is empty (same guard as seqPackSized)
      .filter(size(col("l")) > 0)
      .select(col("doc_id"), col("l"),
        explode(sequence(lit(0L),
          ceil(size(col("l")) / lit(segLen.toDouble)).cast("long") - 1L)).as("i"))
      .select(col("doc_id"),
        array_join(slice(col("l"), (col("i") * segLen + 1).cast("int"), lit(segLen)), " ").as("s"),
        least(size(col("l")).cast("long") - col("i") * segLen, lit(segLen.toLong)).as("stok"))
    // only the segments that ARE boilerplate come back from the
    // frequency aggregate — the unique-segment majority (corpus-sized)
    // never joins, so the probe side is the boilerplate vocabulary
    // (small by definition of boilerplate; AQE broadcasts it when the
    // runtime size allows, plain shuffle otherwise)
    val boiler = segs.groupBy(col("s"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= minDf)
      .select(col("s"), lit(1L).as("is_boiler"))
    segs.join(boiler, Seq("s"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segs"),
        sum(when(col("is_boiler").isNotNull, 1L).otherwise(0L)).as("n_boiler"),
        sum(when(col("is_boiler").isNull, col("stok")).otherwise(0L))
          .cast("long").as("kept_tokens"))
      .withColumn("boiler_ppm", expr("n_boiler * 1000000 DIV n_segs"))
      .orderBy(col("doc_id"))
  }

  /** cos·10⁶ snap shared verbatim with the DuckDB oracle: every input
    * (dot, aa, bb) is an exact integer ≤ dims·10¹² < 2⁵³, SQRT is
    * IEEE-correctly-rounded in both engines, and both parsers
    * left-associate — so the full float sequence is bit-identical. */
  private[graft] val cosPpmSql: String =
    "CAST(FLOOR(1000000.0 * CAST(dot AS DOUBLE) / " +
      "(SQRT(CAST(aa AS DOUBLE)) * SQRT(CAST(bb AS DOUBLE)))) AS BIGINT)"

  /** EXACT embedding near-dup pairs under a blocking key — the
    * entity-resolution complement to [[embedPairs]]. LSH (the scale
    * path) is probabilistic, so it can't be oracled; this variant is
    * deterministic end-to-end: embeddings snap to integer micro-units
    * (floor(x·10⁶+0.5) — exact on a double), candidates are all pairs
    * sharing the blocking key (`label` here; a real corpus blocks on a
    * high-cardinality key — shard, cluster id, domain), and the cosine
    * is computed over the micro-int vectors with every intermediate
    * exact: products ≤ 10¹², 64-dim sums ≤ 6.4·10¹³ < 2⁵³, so even the
    * double-arithmetic kernel is integer-exact and the only rounding is
    * the final shared-text ppm snap.
    *
    * Scale: cost is quadratic WITHIN a block by design (that is the
    * semantics of blocked ER); the equi-join on the key shuffles each
    * block to one place and Spark's hash join + codegen'd dot kernel
    * do the pair work. Block sizes must be bounded by the caller's
    * choice of key — the scaladoc'd contract of every blocked-ER
    * system — with [[embedPairs]] as the fallback when no bounded key
    * exists. */
  def embedDedupExactPairs(emb: DataFrame, thresholdPpm: Long = 300000L): DataFrame = {
    // micro-int as DOUBLE array: values ≤ 10⁶ are exact doubles, so the
    // codegen'd dot kernel (double accumulator) stays integer-exact
    val q = spread(emb.select(col("vec_id"), col("label"), col("embedding")))
      .select(col("vec_id"), col("label"),
        transform(col("embedding"),
          x => floor(x.cast("double") * 1000000d + 0.5d).cast("double")).as("m"))
      .withColumn("aa", graft.functions.VectorFunctions
        .dotProduct(col("m"), col("m")).cast("long"))
      .persistTracked()
    val a = q.select(col("label"), col("vec_id").as("id_a"),
      col("m").as("ma"), col("aa").as("aa"))
    val b = q.select(col("label"), col("vec_id").as("id_b"),
      col("m").as("mb"), col("aa").as("bb"))
    a.join(b, Seq("label"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dot", graft.functions.VectorFunctions
        .dotProduct(col("ma"), col("mb")).cast("long"))
      .withColumn("cos_ppm", expr(cosPpmSql))
      .filter(col("cos_ppm") >= thresholdPpm)
      .select(col("id_a"), col("id_b"), col("cos_ppm"))
      .orderBy(col("id_a"), col("id_b"))
  }

  def embedDedupExact(t: Tables): DataFrame = embedDedupExactPairs(t.embeddings)

  /** SemDeDup-shaped semantic dedup (Abbas et al. 2023): embedding
    * near-dup pairs within blocks → transitive closure → keep one
    * representative (min vec_id) per semantic cluster. Composition of
    * two already-verified kernels: the deterministic blocked-ER pair
    * stage and the O(log n)-round pointer-jumping closure, whose input
    * is only the pair graph — a vanishing fraction of corpus rows.
    * Emits the clustered vectors with their cluster, its size, and the
    * keep decision (singletons are implicitly kept and not listed,
    * like [[dedupClusters]]). */
  def semDedup(t: Tables): DataFrame = {
    val pairs = embedDedupExactPairs(t.embeddings)
      .select(col("id_a").as("a"), col("id_b").as("b"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("cluster_id"))
    Components.connectedComponents(pairs)
      .select(col("node").as("vec_id"), col("lbl").as("cluster_id"))
      .withColumn("cluster_size", count(lit(1)).over(w).cast("long"))
      .withColumn("keep",
        when(col("vec_id") === col("cluster_id"), 1L).otherwise(0L))
      .orderBy(col("vec_id"))
  }

  /** End-to-end near-dup corpus dedup: MinHash+LSH pairs → connected
    * components (a doc transitively near-dup with a kept doc must also
    * drop, even if the pairwise match was indirect) → min-id survivor
    * per cluster → anti-join the corpus. This is the composition a
    * training-data pipeline actually ships: pair detection alone
    * under-deletes chains (A~B, B~C but A!~C). All stages are the
    * already-verified kernels; the anti-join carries only doc ids. */
  def nearDupSurvivors(docs: DataFrame, threshold: Double = 0.5): DataFrame = {
    val pairs = minhashPairs(docs, threshold = threshold)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val drop = Components.connectedComponents(pairs)
      .filter(col("lbl") =!= col("node")) // survivors keep their own id
      .select(col("node").as("doc_id"))
    docs.join(drop, Seq("doc_id"), "left_anti")
  }

  /** Exact n-gram Jaccard over a deterministic candidate window
    * (each 10th doc vs its next 5 ids) — the SQL-verifiable instance
    * of the Jaccard kernel used by minhashPairs' verify step.
    *
    * The window is an EQUI-join, not a non-equi band join: because
    * doc_a is a multiple of 10, `doc_b ∈ (doc_a, doc_a+5]` holds iff
    * `(doc_b-1) div 5 = doc_a div 5` — a bucket key both sides can
    * hash-partition on, so the plan is a shuffled/broadcast hash join
    * instead of a BroadcastNestedLoopJoin that streams every b row
    * past every a row. The band predicate stays as a (redundant)
    * post-join filter documenting the intended semantics. */
  def ngramJaccard(t: Tables): DataFrame = {
    val g = shingled(t.documents, 2).withColumnRenamed("sh", "grams")
    val a = g.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id").as("doc_a"), col("grams").as("ga"),
        floor(col("doc_id") / lit(5.0)).cast("long").as("bkt"))
    val b = g.select(col("doc_id").as("doc_b"), col("grams").as("gb"),
      floor((col("doc_id") - 1) / lit(5.0)).cast("long").as("bkt"))
    a.join(b, Seq("bkt"))
      .filter(col("doc_b") > col("doc_a") && col("doc_b") <= col("doc_a") + 5)
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("ga"), col("gb"))).cast("double") /
          size(array_union(col("ga"), col("gb")))).as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Keep-BEST dedup: within each exact-content group the survivor is
    * the highest-quality copy (longest, doc_id tie-break), not the
    * arbitrary first — the policy real corpus dedup wants when copies
    * differ in truncation. One window shuffle on the content hash. */
  def keepBest(t: Tables): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text")))
      .orderBy(col("n_chars").desc, col("doc_id"))
    t.documents
      .withColumn("rn", row_number().over(w))
      .withColumn("n_copies", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(md5(col("text")))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("n_chars"), col("n_copies").cast("long").as("n_copies"))
      .orderBy(col("doc_id"))
  }

  /** Blocked fuzzy matching (entity resolution): candidate pairs come
    * from an equi-join on a cheap BLOCKING key (here the name's first
    * word), then the expensive edit-distance predicate runs only
    * within blocks — the classic way record linkage avoids the n²
    * levenshtein matrix. Output is a skinny per-record match summary.
    * At 100 TB the blocking key must carry enough cardinality to keep
    * blocks executor-sized (compose several keys — first-token +
    * length bucket + soundex — and union the candidate sets); a hot
    * block is ordinary join skew for AQE. */
  def fuzzyMatches(t: Tables, maxDist: Int = 3): DataFrame = {
    // The oracled instance links the small-part slice (p_size <= 5):
    // linkage runs against a candidate subset in practice (new records
    // vs a reference slice), and the slice keeps the within-block pair
    // count proportional to SF instead of SF². The test vocabulary has
    // only 8 first words, so block sizes are pathological by design —
    // the length prefilter plus the THRESHOLDED levenshtein (banded
    // O(k·n) instead of O(n²), early-exit past maxDist) keep the
    // residual cheap; real data gets its cardinality from composing
    // blocking keys (first-token + length bucket + soundex).
    val p = t.part.filter(col("p_size") <= 5)
      .select(col("p_partkey"), col("p_name"),
        substring_index(col("p_name"), " ", 1).as("blk"),
        length(col("p_name")).as("len"))
    val b = p.select(col("blk"), col("p_partkey").as("other"),
      col("p_name").as("other_name"), col("len").as("other_len"))
    p.join(b, Seq("blk"))
      .filter(col("other") =!= col("p_partkey") &&
        col("other_name") =!= col("p_name") &&
        abs(col("len") - col("other_len")) <= maxDist &&
        levenshtein(col("p_name"), col("other_name"), maxDist) >= 0)
      .groupBy(col("p_partkey"))
      .agg(count(lit(1)).as("n_matches"), min(col("other")).as("best_match"))
      .orderBy(col("p_partkey"))
  }

  /** Near-dup CLUSTERS: the verified MinHash pair graph closed into
    * connected components — the product step a dedup pipeline actually
    * ships (pick one survivor per cluster, not per pair, so transitive
    * chains A~B~C collapse together even when A~C was never a
    * candidate). Pair generation is the banded LSH pipeline (never
    * all-pairs); the closure is the O(log n)-round pointer-jumping
    * loop, whose input is only the pair graph — a vanishing fraction
    * of corpus rows. Uses the md5 oracle-parity kernel so DuckDB
    * reproduces the pairs, then a recursive CTE mirrors the closure. */
  def dedupClusters(t: Tables): DataFrame = {
    val pairs = minhash(t).select(col("doc_a").as("a"), col("doc_b").as("b"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("cluster_id"))
    Components.connectedComponents(pairs)
      .select(col("node").as("doc_id"), col("lbl").as("cluster_id"))
      .withColumn("cluster_size", count(lit(1)).over(w).cast("long"))
      .orderBy(col("doc_id"))
  }

  /** Tokenized documents: (doc_id, text) → + toks array + token count. */
  private def tokedDocs(t: Tables): DataFrame =
    spread(t.documents.select(col("doc_id"), col("text")))
      .withColumn("toks", TextFunctions.tokens(col("text")))
      .withColumn("n", size(col("toks")).cast("long"))

  /** Raw duplicated-gram spans shared by [[substrDedup]] and
    * [[spanIslands]]: every non-keeper occurrence of a corpus-
    * duplicated k-gram as a (doc_id, s, e) token interval. Keep-one
    * semantics — min (doc_id, pos) keeper, encoded as doc_id·10⁶+pos
    * so one bigint MIN finds it. One shuffle on the gram hash (count +
    * keeper MIN are map-side partial aggs); occurrences join back by
    * hash, linear in grams. */
  private def dupSpans(docs: DataFrame, k: Int): DataFrame = {
    val grams = docs.filter(col("n") >= k) // shorter docs hold no k-gram
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), (col("n") - (k - 1)).cast("int")),
          i => struct(i.cast("long").as("i"),
            md5(concat_ws(" ", slice(col("toks"), i, lit(k)))).as("h"))))
          .as("g"))
      .select(col("doc_id"), col("g.i").as("i"), col("g.h").as("h"))
    val dup = grams
      .groupBy(col("h"))
      .agg(count(lit(1)).as("c"),
        min(col("doc_id") * 1000000L + col("i")).as("keep"))
      .filter(col("c") > 1)
    grams.join(dup, Seq("h"))
      .filter(col("doc_id") * 1000000L + col("i") =!= col("keep"))
      .select(col("doc_id"), col("i").as("s"), (col("i") + (k - 1)).as("e"))
  }

  /** Per-doc interval UNION of [[dupSpans]] — gaps-and-islands over
    * span starts (an island opens where start > running max(end));
    * emits (doc_id, island, nsp, is, ie). Spans per doc ≪ positions
    * per doc: one skinny doc-partitioned window, nothing k-expanded. */
  private def spanIslandsOf(spans: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("s"))
    spans
      .withColumn("prev_max",
        max(col("e")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("opens",
        when(col("prev_max").isNull || col("s") > col("prev_max"), 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("opens")).over(w))
      .groupBy(col("doc_id"), col("island"))
      .agg(count(lit(1)).as("nsp"), min(col("s")).as("is"), max(col("e")).as("ie"))
  }

  /** Exact duplicated-PASSAGE removal (the Spark re-expression of
    * Lee et al. 2022's suffix-array ExactSubstr dedup): every token
    * covered by a k-gram that appears elsewhere in the corpus is
    * removed, EXCEPT the globally-first occurrence of each duplicated
    * gram (keep-one semantics). Unlike [[blockDedup]]'s aligned fixed
    * blocks, coverage here is UNALIGNED: any sliding k-window that
    * repeats marks its span.
    *
    * Scale: raw spans collapse to their per-doc interval union FIRST
    * ([[spanIslandsOf]] — interval endpoints only, never k-expanded
    * positions), then a SWEEP-LINE marks covered tokens: island
    * open/close events union with the token stream and one
    * doc-partitioned window keeps tokens where the running open-count
    * is zero. No position explosion, no distinct, no per-position
    * anti join — the corpus-sized shuffles are the token window and
    * the reassembly groupBy, both on doc_id (the window's hash
    * partitioning is reused by the groupBy, so tokens cross the wire
    * once). Reassembly is identical to [[TextAnalysis.vocabPrune]]'s. */
  def substrDedup(t: Tables, k: Int = 10): DataFrame = {
    val docs = tokedDocs(t)
    val tk = docs.select(col("doc_id"),
      posexplode(col("toks")).as(Seq("pos0", "tok")))
      .select(col("doc_id"), (col("pos0") + 1).cast("long").as("i"), col("tok"))
    val islands = spanIslandsOf(dupSpans(docs, k))
    // sweep-line events: +1 at island start, -1 one past its end; the
    // token at position i is covered iff the running delta sum over
    // (i, events-before-tokens) is positive
    val events = islands
      .select(col("doc_id"), col("is").as("i"), lit(1L).as("delta"))
      .unionByName(islands
        .select(col("doc_id"), (col("ie") + 1L).as("i"), lit(-1L).as("delta")))
      .select(col("doc_id"), col("i"), lit(0).as("pri"), col("delta"),
        lit(null).cast("string").as("tok"))
    val sweep = tk
      .select(col("doc_id"), col("i"), lit(1).as("pri"), lit(0L).as("delta"),
        col("tok"))
      .unionByName(events)
    val sw = Window.partitionBy(col("doc_id")).orderBy(col("i"), col("pri"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val kept = sweep
      .withColumn("active", sum(col("delta")).over(sw))
      .filter(col("pri") === 1 && col("active") === 0L)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          sort_array(collect_list(struct(col("i"), col("tok")))),
          _.getField("tok")), " ").as("cleaned"))
    docs.select(col("doc_id"), col("n").as("n_tok"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tok"),
        (col("n_tok") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("cleaned"), lit("")).as("cleaned"))
      .orderBy(col("doc_id"))
  }

  /** Duplicated-span INTERVAL MERGE diagnostics — per-doc raw-span vs
    * island counts and the covered-token total, computed from interval
    * endpoints only (the same coverage number [[substrDedup]] enforces
    * during removal, surfaced as a dashboard without rebuilding text).
    * Built on the shared [[dupSpans]] → [[spanIslandsOf]] pipeline. */
  def spanIslands(t: Tables, k: Int = 10): DataFrame =
    spanIslandsOf(dupSpans(tokedDocs(t), k))
      .groupBy(col("doc_id"))
      .agg(sum(col("nsp")).as("n_spans"),
        count(lit(1)).as("n_islands"),
        sum(col("ie") - col("is") + 1).as("covered_tok"))
      .orderBy(col("doc_id"))

  /** Cross-source DUPLICATION MATRIX: verified near-dup pairs rolled
    * up by unordered (source, source) — the provenance dashboard that
    * shows which sources mirror which (news syndication, crawl
    * overlap) and whether dedup should run within or across sources.
    *
    * Scale: the pair frame is data-dependent — on a duplicate-heavy
    * web corpus it can hold 20-50% of doc ids, far past any broadcast
    * cap — so NO broadcast hint: the lookups are plain equi-joins on
    * doc id (two skinny shuffles of (id, source) pairs), and AQE
    * converts them to broadcasts at runtime whenever the measured
    * pair frame actually fits. */
  def sourceDupMatrix(t: Tables): DataFrame = {
    val pairs = minhash(t).select(col("doc_a"), col("doc_b"))
    val src = t.documents.select(col("doc_id"), col("source"))
    pairs
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("src_a")),
        Seq("doc_a"))
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("src_b")),
        Seq("doc_b"))
      .select(least(col("src_a"), col("src_b")).as("source_a"),
        greatest(col("src_a"), col("src_b")).as("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("n_pairs").desc, col("source_a"), col("source_b"))
  }

  /** LSH estimator ACCURACY AUDIT: for every shipped near-dup pair,
    * the MinHash signature estimate of Jaccard (matching slots / 32,
    * in ppm) against the exact shingle-set Jaccard (∩·1e6 DIV ∪) and
    * their signed error — the dashboard that tells an operator whether
    * 32 permutations are enough for the corpus at hand before a 100 TB
    * run commits to them. All integer floor arithmetic.
    *
    * Scale: audits only the VERIFIED pairs (pair-graph-sized), joining
    * signatures and shingle sets back by doc id — equi-joins on ids,
    * never a second pass over candidate generation. `sh` is NOT
    * persisted: recomputing the narrow shingle map for its two join
    * uses is cheaper than pinning a corpus-sized cache frame (and a
    * lazily-returned plan has no safe point to unpersist it). */
  def lshAudit(t: Tables): DataFrame = {
    val pairs = minhashPairs(t.documents, shingleHash = md5Hash31,
      bandKeyOf = bandKeysStr).select(col("doc_a"), col("doc_b"))
    val sh = shingled(t.documents, 3)
      .persistTracked() // r18: signature build + both exact-side joins
    val sig = minhashSignatures(sh, 32, md5Hash31)
      .persistTracked() // r18: joined per pair side — unpersisted, the
      // 32-hash signature pass ran once per side
    pairs
      .join(sig.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), Seq("doc_a"))
      .join(sig.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), Seq("doc_b"))
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          b => b)).cast("long").as("m"),
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long").as("ni"),
        size(array_union(col("sh_a"), col("sh_b"))).cast("long").as("nu"))
      .withColumn("est_ppm", expr("m * 1000000 DIV 32"))
      .withColumn("exact_ppm", expr("ni * 1000000 DIV nu"))
      .withColumn("err_ppm", col("est_ppm") - col("exact_ppm"))
      .select(col("doc_a"), col("doc_b"), col("est_ppm"),
        col("exact_ppm"), col("err_ppm"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** SoftDeDup-style REWEIGHTING (keep every document, down-weight
    * duplicates): sampling weight = 1e6 / near-dup-cluster-size ppm,
    * so a cluster of k near-copies contributes ~one document's worth
    * of training mass instead of k — the gentler alternative to
    * removal when near-dups still carry signal (cf. SlimPajama /
    * soft dedup ablations). Built on [[dedupClusters]]' verified
    * MinHash pair graph + component closure; docs outside any pair
    * keep weight 1e6.
    *
    * Scale: the cluster frame is data-dependent (20-50% of doc ids on
    * a duplicate-heavy corpus), so NO broadcast hint — the weight
    * lookup is a plain left equi-join on doc id (one skinny shuffle of
    * (id, size) pairs); AQE broadcasts at runtime when the measured
    * frame fits. */
  def softDedup(t: Tables): DataFrame = {
    val cl = dedupClusters(t).select(col("doc_id"), col("cluster_size"))
    t.documents.select(col("doc_id"))
      .join(cl, Seq("doc_id"), "left")
      .withColumn("cluster_size", coalesce(col("cluster_size"), lit(1L)))
      .withColumn("weight_ppm", expr("1000000 DIV cluster_size"))
      .select(col("doc_id"), col("cluster_size"), col("weight_ppm"))
      .orderBy(col("doc_id"))
  }

  /** PPJoin-style EXACT set-similarity join (Xiao et al. WWW'08
    * prefix filtering + length filter): all document pairs with
    * bigram-set Jaccard ≥ 0.9, found WITHOUT all-pairs and WITHOUT
    * the MinHash family's false negatives — the deterministic-exact
    * complement to [[minhash]]. Each doc's DISTINCT word-bigram set
    * is ordered by global rarity (df asc, the PPJoin heuristic that
    * minimizes candidates — any common total order is correct); only
    * the first |s|−⌈t·s⌉+1 elements (the PREFIX) enter the candidate
    * equi-join, because two sets with J ≥ t MUST share a prefix
    * element. The length filter (5·min ≥ 4·max, exact integers for
    * t = 4/5) prunes size-incompatible pairs inside the join, and
    * exact intersection counting runs only on survivors; the Jaccard
    * test 5i ≥ 4(sa+sb−i) and jac_ppm are pure integer arithmetic —
    * DuckDB replays everything.
    *
    * Scale: candidates are an equi-join on RARE tokens only (prefix
    * elements are the df-ascending head, so hot tokens never block),
    * pruned in-join by the length filter AND the POSITIONAL filter
    * (a shared prefix element at positions (pa, pb) can only reach
    * the required overlap if min(sa−pa, sb−pb)+1 ≥ ⌈(9/19)(sa+sb)⌉ —
    * measured 667k → 181k candidates at sf0.1 together with the 0.9
    * threshold, on the worst-case corpus);
    * verification is an IN-ROW array_intersect over the two docs'
    * bigram arrays (no exploded token re-join — the candidate×token
    * blow-up was the measured hot spot). Set sizes/df are
    * heavy-hitter aggregates, map-side combined. Self-similar
    * corpora inflate candidates (the deliberately narrow test
    * vocabulary is the worst case — real text has far more
    * distinctive bigrams). */
  def setJoinPrefix(t: Tables): DataFrame = {
    val sets = spread(t.documents.select(col("doc_id"), col("text")))
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("l"))
      // size >= 2 guard: sequence(1, 0) DESCENDS and element_at(l, 0)
      // throws — a 1-token doc has no bigrams and can never pair, so
      // dropping it here matches the oracle's empty generate_series
      .filter(size(col("l")) >= 2)
      .select(col("doc_id"), expr(
        "array_distinct(transform(sequence(1, size(l) - 1), " +
          "i -> concat(element_at(l, i), ' ', element_at(l, i + 1))))").as("arr"))
      .withColumn("s", size(col("arr")).cast("long"))
      .persistTracked() // feeds df, prefix, and in-row verification
    val toks = sets.select(col("doc_id"), col("s"), explode(col("arr")).as("w"))
    val dfreq = toks.groupBy(col("w")).agg(count(lit(1)).as("df"))
    // r18 (guide §2.3 — narrower types through the shuffles): assign
    // each bigram a GLOBAL dense rarity rank wid (row number in
    // (df, w) order over the vocabulary-sized df frame — the same
    // total order as before, so every position p and therefore every
    // candidate is unchanged); the per-doc rank window then sorts
    // longs instead of bigram strings and the prefix self-join hashes
    // an 8-byte key instead of a ~20-byte string.
    val wids = Curation.globalRowNumber(dfreq, col("df"), col("w"))
      .select(col("w"), col("_rn").as("wid"))
    val pos = toks.join(wids, Seq("w"))
      .select(col("doc_id"), col("s"), col("wid"))
      .withColumn("p", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("wid"))))
    val pref = pos.filter(col("p") <= col("s") - expr("(9 * s + 9) DIV 10") + 1)
      .persistTracked() // self-joined: rank the corpus once, not twice
    val cand = pref.select(col("wid"), col("doc_id").as("doc_a"),
        col("s").as("sa"), col("p").as("pa"))
      .join(pref.select(col("wid"), col("doc_id").as("doc_b"),
        col("s").as("sb"), col("p").as("pb")), Seq("wid"))
      .filter(col("doc_a") < col("doc_b") &&
        col("sb") * 10 >= col("sa") * 9 && col("sa") * 10 >= col("sb") * 9 &&
        least(col("sa") - col("pa"), col("sb") - col("pb")) + 1 >=
          expr("(9 * (sa + sb) + 18) DIV 19"))
      .select(col("doc_a"), col("doc_b")).distinct()
    // r18: verify on the wid-encoded sets — the encoding is bijective,
    // so |A∩B| and |A| are unchanged, while the candidate joins ship
    // 8-byte longs instead of ~20-byte bigram strings and
    // array_intersect compares longs. The encoded arrays group out of
    // `pos`, which the rank window already partitioned by doc_id —
    // zero additional Exchange (guide §2.4).
    val enc = pos.groupBy(col("doc_id"))
      .agg(collect_list(col("wid")).as("arr"))
      .persistTracked() // both verify joins read it; doc-sized frame
    cand
      .join(enc.select(col("doc_id").as("doc_a"), col("arr").as("la")),
        Seq("doc_a"))
      .join(enc.select(col("doc_id").as("doc_b"), col("arr").as("lb")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("la"), col("lb"))).cast("long").as("inter"),
        size(col("la")).cast("long").as("sa"),
        size(col("lb")).cast("long").as("sb"))
      .filter(col("inter") * 10 >= (col("sa") + col("sb") - col("inter")) * 9)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("sa"), col("sb"),
        expr("CAST((inter * 1000000) DIV (sa + sb - inter) AS BIGINT)")
          .as("jac_ppm"))
      .orderBy(col("doc_a"), col("doc_b"))
  }
}
