package graft.operators

import graft.CacheRegistry.Tracked
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Retrieval / data-selection scoring over the document corpus: BM25
  * ranking and DSIR-style hashed-n-gram importance weights — the two
  * standard "pick the best training documents" primitives (BM25 for
  * query-driven retrieval / RAG eval; importance weights for
  * distribution matching à la DSIR, Xie et al. 2023).
  *
  * Scale design: both operators scan the corpus exactly once and keep
  * every per-term / per-bucket side table tiny and broadcast. All
  * floating-point steps are per-row scalar expressions with a FIXED
  * operation order shared verbatim with the DuckDB oracle (IEEE ops on
  * identical inputs in identical order are bit-identical across
  * engines), and every aggregate crosses the shuffle as exact integer
  * micro-units — so results are engine-exact at any scale.
  */
object Retrieval {

  /** Default query for the BM25 instance — mid-frequency corpus terms. */
  val defaultQuery: Seq[String] = Seq("vector", "stream", "window", "merge")

  /** BM25 score expression in micro-units, with k1 = 6/5 and b = 3/4
    * folded into one rational form so every input is an exact integer:
    *
    *   idf  = (N − df + 0.5)/(df + 0.5)        [rational Robertson idf
    *          = (2N − 2df + 1)/(2df + 1); log-free so no libm drift]
    *   tfp  = f·(k1+1) / (f + k1·(1 − b + b·dl/avgdl))
    *        = 22·f·T / (10·f·T + 3·T + 9·dl·N)  with avgdl = T/N
    *
    * The expression TEXT is shared between the Spark plan and the
    * DuckDB oracle — both parsers are left-associative, so the IEEE op
    * sequence is identical and the floor-snap to micro-units is
    * byte-stable. Columns: f (term freq), df (doc freq), dl (doc
    * length), n (corpus docs), tt (corpus tokens). */
  val bm25ScoreSql: String =
    """CAST(FLOOR(1000000.0 *
      |  (CAST(2*n - 2*df + 1 AS DOUBLE) * 22.0 * CAST(f AS DOUBLE) * CAST(tt AS DOUBLE)) /
      |  (CAST(2*df + 1 AS DOUBLE) *
      |   (10.0 * CAST(f AS DOUBLE) * CAST(tt AS DOUBLE) + 3.0 * CAST(tt AS DOUBLE) +
      |    9.0 * CAST(dl AS DOUBLE) * CAST(n AS DOUBLE)))) AS BIGINT)""".stripMargin

  /** BM25 top-k retrieval for a fixed query over `documents`.
    *
    * One corpus scan: tokenize → explode → filter to the |Q| query
    * terms map-side (everything else never leaves the scan stage).
    * Per-term doc frequencies collapse to |Q| rows (broadcast), corpus
    * stats to one row (broadcast), so the only wide shuffle is the
    * (doc, term) partial-count — map-side combined on a key space of
    * |docs|·|Q|. Top-k is orderBy+limit → Spark plans TakeOrdered (a
    * per-partition heap + driver merge of k·partitions rows), not a
    * global sort. */
  def bm25(t: Tables, terms: Seq[String] = defaultQuery, k: Int = 20): DataFrame = {
    val toks = graft.functions.TextFunctions.tokens(col("text"))
    val exploded = Dedup.spread(
        t.documents.select(col("doc_id"), toks.as("toks")))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("term"))
    // one row per (doc, query term): the only non-broadcast shuffle
    val tf = exploded.filter(col("term").isInCollection(terms))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).cast("long").as("f"))
      .persistTracked() // feeds df AND the score join
    val df = tf.groupBy(col("term")).agg(count(lit(1)).cast("long").as("df"))
    val stats = t.documents.agg(
      count(lit(1)).cast("long").as("n"),
      sum(size(toks)).cast("long").as("tt"))
    tf.join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("s_micro", expr(bm25ScoreSql))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_terms_hit"),
        sum(col("s_micro")).cast("long").as("score_micro"))
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(k)
  }

  /** DSIR-style importance scores: hashed word-bigram features, target
    * distribution = English documents, raw distribution = the whole
    * corpus. The classic method weights a document by how much more
    * likely its features are under the target than the raw
    * distribution; this linearized variant scores
    * Σ_b count_doc(b)·(ppm_target(b) − ppm_raw(b)) in EXACT integer
    * ppm, so the weights are engine-independent (the log-ratio form
    * would ride on libm ln).
    *
    * Scale: one corpus scan explodes bigrams map-side; the per-bucket
    * contrast table is `buckets` rows (broadcast); the per-(doc,
    * bucket) count shuffle is map-side combined with key space
    * |docs|·buckets. Bucketing is the md5-31bit family the LSH
    * operators already share with DuckDB. */
  def dsirWeights(t: Tables, buckets: Int = 256): DataFrame = {
    require((buckets & (buckets - 1)) == 0, "buckets must be a power of two")
    val mask = (buckets - 1).toLong
    val grams = Dedup.spread(
        t.documents.select(col("doc_id"), col("lang"),
          graft.functions.TextFunctions.tokens(col("text")).as("toks")))
      .select(col("doc_id"), col("lang"),
        explode(graft.functions.TextFunctions.wordNgramsOf(col("toks"), 2)).as("g"))
      .select(col("doc_id"), col("lang"),
        Dedup.md5Hash31(col("g")).bitwiseAND(lit(mask)).as("b"))
      .persistTracked() // feeds the raw histogram, the target histogram, and per-doc counts
    val raw = grams.groupBy(col("b")).agg(count(lit(1)).as("c_raw"))
    val tgt = grams.filter(col("lang") === "en")
      .groupBy(col("b")).agg(count(lit(1)).as("c_tgt"))
    // ppm tables stay exact integers; buckets missing from the target
    // side count 0 (left join), total counts ride along via window-free
    // broadcast one-row aggregates
    val totals = grams.agg(
      count(lit(1)).as("tot_raw"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).cast("long").as("tot_tgt"))
    val contrast = raw
      .join(tgt, Seq("b"), "left")
      .na.fill(0L, Seq("c_tgt"))
      .crossJoin(broadcast(totals))
      .select(col("b"),
        expr("c_tgt * 1000000 DIV tot_tgt - c_raw * 1000000 DIV tot_raw").as("dppm"))
    grams.groupBy(col("doc_id"), col("b")).agg(count(lit(1)).cast("long").as("c"))
      .join(broadcast(contrast), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).cast("long").as("n_feats"),
        sum(col("c") * col("dppm")).cast("long").as("score"))
      .orderBy(col("doc_id"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of the
    * two standard hybrid-retrieval rankers: BM25 (sparse) and exact
    * embedding cosine to a query vector (dense; vec_id 0 is the query,
    * vec_id doubles as doc_id in the synthetic schema). Both ranked
    * lists are truncated at `depth`; rrf(d) = Σ 1/(kRrf + rank_r(d))
    * over the lists d appears in — two correctly-rounded IEEE
    * divisions and one add in a FIXED order, so the fused score is
    * bit-identical cross-engine with no transcendental in sight.
    *
    * Scale: each ranker is its own already-scale-shaped operator
    * ([[bm25]]'s one scan + broadcast side tables; the cosine ranker
    * scans vectors once and TakeOrdered's the top `depth` — swap in
    * the IVF/LSH ANN path for a billion-vector corpus). The fusion
    * itself joins two ≤depth-row frames: driver-trivial, any engine.
    * Rank assignment windows run on ≤depth rows post-truncation — the
    * single-partition window is bounded by construction. */
  def rrfFusion(t: Tables, terms: Seq[String] = defaultQuery, k: Int = 20,
                depth: Int = 100, kRrf: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wBm = Window.orderBy(col("score_micro").desc, col("doc_id"))
    val bmR = bm25(t, terms, depth)
      .withColumn("r_bm25", row_number().over(wBm).cast("long"))
      .select(col("doc_id"), col("r_bm25"))
    val q = Dedup.spread(t.embeddings.select(col("vec_id"), col("embedding")))
      .select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * 1000000d + 0.5d).cast("double")).as("m"))
      .withColumn("aa", graft.functions.VectorFunctions
        .dotProduct(col("m"), col("m")).cast("long"))
      .persistTracked() // query row + candidate scan share the quantize
    val qv = q.filter(col("vec_id") === 0L)
      .select(col("m").as("mq"), col("aa").as("bb"))
    val wCos = Window.orderBy(col("cos_ppm").desc, col("doc_id"))
    val cosR = q.filter(col("vec_id") =!= 0L)
      .crossJoin(broadcast(qv)) // one bounded row
      .withColumn("dot", graft.functions.VectorFunctions
        .dotProduct(col("m"), col("mq")).cast("long"))
      .withColumn("cos_ppm", expr(Dedup.cosPpmSql))
      .select(col("vec_id").as("doc_id"), col("cos_ppm"))
      .orderBy(col("cos_ppm").desc, col("doc_id")).limit(depth)
      .withColumn("r_cos", row_number().over(wCos).cast("long"))
      .select(col("doc_id"), col("r_cos"))
    bmR.join(cosR, Seq("doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(kRrf.toLong) + col("r_bm25")).cast("double"), lit(0.0)) +
        coalesce(lit(1.0) / (lit(kRrf.toLong) + col("r_cos")).cast("double"), lit(0.0)))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("r_bm25"), col("r_cos"), col("rrf"))
  }

  /** Exact phrase search over a positional inverted index — the
    * capability BM25's bag-of-words scoring can't express (finding
    * "data join" as CONSECUTIVE tokens, the way search engines
    * implement quoted queries and dedup pipelines locate verbatim
    * quotations). Postings are (doc, position) rows for the phrase's
    * terms only; a w-word phrase matches where the w postings lists
    * align at consecutive positions, expressed as w−1 equi-joins on
    * (doc_id, pos − offset) — position adjacency AS a join key, never
    * a per-document scan.
    *
    * Scale: the corpus is tokenized once and filtered to the phrase's
    * terms BEFORE anything shuffles, so each join moves only those
    * terms' postings (term-frequency-sized, not corpus-sized). The
    * per-term frames share one persisted postings scan. Duplicate
    * words in the phrase cost nothing extra — the same postings frame
    * joins against itself at a different offset. */
  def phraseSearch(t: Tables,
                   phrase: Seq[String] = Seq("data", "join")): DataFrame =
    phraseSearchDocs(t.documents, phrase)

  /** [[phraseSearch]] over an explicit (doc_id, text) frame. */
  def phraseSearchDocs(docs: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty)
    val el = Dedup.spread(docs.select(col("doc_id"), col("text")))
      .select(col("doc_id"),
        posexplode(graft.functions.TextFunctions.tokens(col("text")))
          .as(Seq("p0", "term")))
      .filter(col("term").isInCollection(phrase.distinct))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"), col("term"))
      .persistTracked() // one postings scan feeds all w join legs
    val first = el.filter(col("term") === phrase.head)
      .select(col("doc_id"), col("pos"))
    phrase.zipWithIndex.tail
      .foldLeft(first) { case (acc, (w, i)) =>
        acc.join(el.filter(col("term") === w)
          .select(col("doc_id"), (col("pos") - i).as("pos")),
          Seq("doc_id", "pos"))
      }
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_matches"),
        min(col("pos")).cast("long").as("first_pos"))
      .orderBy(col("doc_id"))
  }
}
