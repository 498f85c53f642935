package graft.operators

import graft.CacheRegistry.Tracked
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed suffix-array construction by prefix doubling
  * (Manber & Myers 1993; the shuffle-based formulation of Flick &
  * Aluru 2015) — the exact-substring machinery behind suffix-array
  * training-data dedup (Lee et al. 2022): after round k every suffix
  * carries an integer rank ORDER-ISOMORPHIC to its first 2^k
  * characters, so equal ranks ⟺ equal 2^k-prefixes and sorting by
  * the final rank IS the suffix array. substrDedup's fixed-k shingle
  * islands approximate this; the SA is the exact arbitrary-length
  * tool.
  *
  * Suffixes never cross document boundaries: positions are keyed
  * (doc_id, off) and the doubling lookup joins on (doc_id, off + 2^k),
  * so a suffix that runs off its document's end pairs with the −1
  * sentinel (shorter-suffix-sorts-first, and two suffixes group
  * together only when their characters AND lengths agree — exactly
  * substring equality).
  *
  * Scale: round k is three skinny shuffles of (doc_id, off, rank)
  * rows — the doubling self-join (hash on (doc_id, off)), a distinct
  * over (rank, rank2) pairs, and the join-back — plus a RANGE
  * partition over the distinct pairs for dense re-ranking via
  * Curation.globalRowNumber (never a single-partition window).
  * O(log maxLen) rounds; state is localCheckpoint'ed per round, the
  * Components lineage discipline. At 100 TB the corpus crosses the
  * wire as (docId, off, rank) triples — ~20 bytes/char/round — the
  * known cost of exact SA dedup, paid only by the pipelines that need
  * arbitrary-length exact repeats (fixed-length needs stay on the
  * cheaper shingle operators). */
object SuffixArray {

  /** One row per character: (doc_id, off 1-based, rank = char code). */
  private def charRanks(docs: DataFrame): DataFrame =
    Dedup.spread(docs.select(col("doc_id"), col("text")))
      .select(col("doc_id"), posexplode(split(col("text"), ""))
        .as(Seq("off0", "ch")))
      .filter(length(col("ch")) > 0) // split("") can emit empty edges
      .select(col("doc_id"), (col("off0") + 1).cast("long").as("off"),
        ascii(col("ch")).cast("long").as("rank"))

  /** Prefix-doubling ranks after `rounds` rounds: equal `rank` ⟺ the
    * suffixes at those positions agree on their first 2^rounds
    * characters (comparing end-of-document as a sentinel). Ranks are
    * DENSE and order-isomorphic to 2^rounds-prefix order. */
  def buildRanks(docs: DataFrame, rounds: Int): DataFrame =
    withLoopTuning(docs) { (r0, round) =>
      var r = r0
      var step = 1L
      for (_ <- 1 to rounds) { r = round(r, step); step *= 2 }
      r
    }

  /** The Components loop discipline for the doubling rounds: size the
    * per-round shuffles to the CHAR table (a (doc,off,rank) row is
    * ~24 bytes — the session default would run 32 near-empty tasks per
    * stage at gate scale), and on small inputs switch AQE off so each
    * round schedules as one classic job (per-round JOB LATENCY, not
    * data, dominates small-corpus doubling).
    *
    * The tuning lives on an ISOLATED child session:
    * `spark.newSession()` shares the SparkContext — and therefore the
    * localCheckpoint block store — but owns its SQLConf, so the
    * loop-sized shuffle partitions and the AQE switch never apply to a
    * plan compiled concurrently on the caller's session (parallel
    * suites, another operator), and a body failure mid-loop has
    * nothing to restore: the child session's conf simply dies with it
    * (orphaned round checkpoints are unpersisted by the
    * ContextCleaner when their RDDs are collected). The callback
    * receives the checkpointed char table re-rooted in the child
    * session and the one-round function. */
  private def withLoopTuning(docs: DataFrame)(
      body: (DataFrame, (DataFrame, Long) => DataFrame) => DataFrame)
      : DataFrame = {
    // char count == Σ length(text): one cheap scan sizes the loop
    // WITHOUT materializing the char table first (the tuning must be
    // known before the char table is checkpointed into the child
    // session, and a count on the exploded table would cost a full
    // extra materialization pass)
    val n = docs.agg(coalesce(sum(length(col("text"))), lit(0L)).cast("long"))
      .head.getLong(0)
    val parts = math.max(8L, math.min(20000L, n / 250000L + 1)).toInt
    val loopSpark = docs.sparkSession.newSession()
    loopSpark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    if (n < 4000000L) loopSpark.conf.set("spark.sql.adaptive.enabled", "false")
    val chars = charRanks(docs)
    val r0 = loopSpark.createDataFrame(chars.rdd, chars.schema)
      .localCheckpoint() // eager — the one materialization of the char table
    body(r0, doubleRound)
  }

  /** One doubling round: rank ⊕ rank-at-(off+step) → dense re-rank. */
  private def doubleRound(r: DataFrame, step: Long): DataFrame = {
    val right = r.select(col("doc_id"), (col("off") - step).as("off"),
      col("rank").as("r2"))
    val paired = r.join(right, Seq("doc_id", "off"), "left")
      .select(col("doc_id"), col("off"), col("rank"),
        coalesce(col("r2"), lit(-1L)).as("r2"))
    val groups = Curation.globalRowNumber(
        paired.select(col("rank"), col("r2")).distinct(),
        col("rank"), col("r2"))
      .withColumnRenamed("_rn", "nrank")
    val out = paired.join(groups, Seq("rank", "r2"))
      .select(col("doc_id"), col("off"), col("nrank").as("rank"))
      .localCheckpoint()
    Components.freeCheckpoint(r)
    out
  }

  /** The full (generalized) suffix array: doubling until the rank
    * partition reaches its FIXPOINT — the distinct-rank count is
    * strictly increasing until no 2^k can split any group further
    * (identical suffixes appearing in SEVERAL documents keep one
    * shared dense rank forever, so "all ranks unique" would never
    * terminate; the fixpoint test handles duplicates for free). The
    * final dense rank IS the 1-based suffix-array position, with ties
    * exactly on identical cross-document suffixes. Returns
    * (sa_pos, doc_id, off). */
  def suffixArray(docs: DataFrame): DataFrame =
    withLoopTuning(docs) { (r0, round) =>
      var r = r0
      var step = 1L
      var prevDistinct = -1L
      var distinctRanks = r.select(col("rank")).distinct().count()
      while (distinctRanks > prevDistinct) {
        prevDistinct = distinctRanks
        r = round(r, step)
        distinctRanks = r.select(col("rank")).distinct().count()
        step *= 2
      }
      r.select(col("rank").as("sa_pos"), col("doc_id"), col("off"))
        .orderBy(col("sa_pos"))
    }

  /** Exact repeated spans of (up to) `2^rounds` characters across the
    * corpus, FROM THE RANK TABLE: suffix positions sharing a round-k
    * rank share their first 2^k characters, so rank groups with ≥ 2
    * members are exactly the repeated prefixes — the oracle groups by
    * the raw substring instead, which gates the whole doubling
    * construction (a wrong rank anywhere splits or merges a group).
    * Output: (prefix, n_occ, n_docs) for each repeated span, the
    * repeated-substring report a dedup pass consumes. */
  def repeatedSpans(t: Tables, rounds: Int = 4): DataFrame =
    repeatedSpansDocs(
      // the ORACLED instance runs on a 20% doc slice: exact SA costs
      // ~20 bytes/char/round on the wire by design, and the slice
      // gates the construction identically at a fifth of the bench
      // budget (13.1 s -> ~2.6 s at sf0.1); full-corpus callers use
      // repeatedSpansDocs directly
      t.documents.filter(col("doc_id") % 5 === 0), rounds)

  /** Exact-substring DOCUMENT dedup on the suffix-array ranks — the
    * Lee et al. 2022 application end-to-end: documents sharing any
    * repeated 2^rounds-char span are linked and collapsed to one
    * survivor per cluster (min doc id, the Dedup convention). The
    * registered instance links on 32-char spans (rounds=5) — 16-char
    * spans over the synthetic 20-word vocabulary link everything into
    * one cluster, the span-length sensitivity a real deployment tunes.
    * Hub spans occurring more than `maxOcc` times are boilerplate and
    * skipped — the minhash giant-bucket cap's exact-substring analog,
    * and the reason group linking stays LINEAR: each kept group
    * contributes star edges to its min doc, never pairwise fan-out.
    * Runs on the same 20% slice as [[repeatedSpans]]; fully oracled
    * (substring groups → star edges → recursive-CTE closure). */
  def saDedup(t: Tables, rounds: Int = 5, maxOcc: Long = 20): DataFrame = {
    val docs = t.documents.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("text"))
    val ranks = buildRanks(docs, rounds)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("rank"))
    val kept = ranks
      .withColumn("n_occ", count(lit(1)).over(w))
      .filter(col("n_occ") >= 2 && col("n_occ") <= maxOcc)
    val gd = kept.select(col("rank"), col("doc_id")).distinct()
    val gmin = gd.groupBy(col("rank")).agg(min(col("doc_id")).as("a"))
    val edges = gd.join(gmin, Seq("rank"))
      .filter(col("doc_id") =!= col("a"))
      .select(col("a"), col("doc_id").as("b")).distinct()
    val cc = Components.connectedComponents(edges)
      .select(col("node").as("doc_id"), col("lbl"))
    docs.select(col("doc_id"))
      .join(cc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("lbl"), col("doc_id")).as("cluster_id"),
        when(coalesce(col("lbl"), col("doc_id")) === col("doc_id"), 1)
          .otherwise(0).as("survivor"))
      .orderBy(col("doc_id"))
  }

  /** [[repeatedSpans]] over an explicit (doc_id, text) frame. */
  def repeatedSpansDocs(documents: DataFrame, rounds: Int = 4): DataFrame = {
    val docs = documents.select(col("doc_id"), col("text"))
    val ranks = buildRanks(docs, rounds)
    val span = 1 << rounds
    val groups = ranks.groupBy(col("rank"))
      .agg(count(lit(1)).cast("long").as("n_occ"),
        countDistinct(col("doc_id")).cast("long").as("n_docs"),
        min(struct(col("doc_id"), col("off"))).as("rep"))
      .filter(col("n_occ") >= 2)
    groups
      .join(docs.withColumnRenamed("doc_id", "rdoc"),
        col("rep.doc_id") === col("rdoc"))
      .select(
        substring(col("text"), col("rep.off").cast("int"), lit(span)).as("prefix"),
        col("n_occ"), col("n_docs"))
      .orderBy(col("prefix"))
  }
}
