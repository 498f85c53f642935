package graft.operators

import graft.CacheRegistry.Tracked
import graft.sinks.TableWriter
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** STORED graph-ANN index — the serving face of [[GraphAnn]], given
  * the same treatment as the MinHash ([[DedupIndex]]) and
  * hyperplane-LSH ([[EmbedIndex]]) indexes: the NN-descent graph is
  * built ONCE, persisted as bucketed tables, and every later session
  * searches or grows it without recomputing anything corpus-sized.
  *
  * Three tables:
  *  - `<prefix>_gedges` (src, dst): the bounded-degree neighbor graph,
  *    bucketed AND sorted by `src` — each search hop's frontier
  *    expansion joins it on src, so the stored side is read in place
  *    and only the (budget-bounded) frontier keys shuffle.
  *  - `<prefix>_gvectors` (vec_id, e): unit-normalized vectors for
  *    scoring, bucketed by `vec_id` — candidate scoring joins it on
  *    the candidate id, in place.
  *  - `<prefix>_gentry` (vec_id): the shared entry points every search
  *    starts from (the build corpus's smallest ids, the Forgy-seed
  *    convention).
  *
  * Search cost is the [[GraphAnn]] probe budget — ≤ seeds +
  * hops·beam·degree scored nodes per query, independent of corpus
  * size — which is the property that makes the STORED form useful: a
  * 10⁹-vector graph answers a query by reading a few hundred bucketed
  * rows, never by scanning vectors.
  *
  * [[insert]] is the HNSW insertion rule re-expressed as joins: each
  * new vector SEARCHES the stored graph for its neighborhood
  * (O(batch · probe budget), index side never rewritten), its best
  * `degree` hits become its out-edges, and the REVERSE edges are
  * appended too so the graph can navigate TO the new nodes. Reverse
  * edges let stored nodes exceed `degree` over many inserts — the
  * standard trade; [[compactIndex]] is the maintenance pass that
  * re-ranks every node back to its best `degree` out-edges (one
  * window over the edge frame joined to stored vectors) and restores
  * the one-file-per-bucket layout. */
object GraphAnnIndex {

  /** negated dot on unit vectors — min-ascending ≡ max cosine, ties by
    * id (GraphAnn's fp convention). */
  private val better: (Column, Column) => Column =
    (a, b) => -aggregate(zip_with(a, b, (x, y) => x * y), lit(0d), _ + _)

  /** (vec_id, e) unit-normalized doubles from a raw embedding frame. */
  private def unitize(vecs: DataFrame): DataFrame =
    Dedup.spread(vecs.select(col("vec_id"), col("embedding")))
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("de"))
      .select(col("vec_id"),
        expr("transform(de, x -> x / sqrt(aggregate(de, 0d, (s, y) -> s + y * y)))")
          .as("e"))

  /** Build the graph over `corpus` (vec_id, embedding) and persist the
    * three index tables. `entrySeeds` smallest ids become the stored
    * entry points. */
  def writeIndex(corpus: DataFrame, prefix: String, buckets: Int = 8,
                 degree: Int = 10, rounds: Int = 4, initSeeds: Int = 3,
                 entrySeeds: Int = 8): Unit = {
    val unit = unitize(corpus).persistTracked()
    val n = unit.count()
    val small = n < 100000L
    def hint(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    val edges = GraphAnn.buildGraph(unit, degree, rounds, initSeeds, n,
      better, hint).select(col("src"), col("dst"))
    TableWriter.writeBucketed(edges, s"${prefix}_gedges", buckets, "src")
    TableWriter.writeBucketed(unit, s"${prefix}_gvectors", buckets, "vec_id")
    val entry = unit.orderBy(col("vec_id")).limit(entrySeeds)
      .select(col("vec_id"))
    TableWriter.writeBucketed(entry, s"${prefix}_gentry", 1, "vec_id")
  }

  /** Beam-search `queries` (vec_id, embedding — ids are the CALLER's
    * labels, must not collide with indexed ids) against the stored
    * graph. Returns (query_id, rank, neighbor_id, cosine), the
    * [[GraphAnn.knnGraphFp]] shape. The stored side joins run against
    * the bucketed layout — no index-side Exchange, only frontier keys
    * move. */
  def search(spark: SparkSession, queries: DataFrame, prefix: String,
             k: Int = 5, beam: Int = 12, hops: Int = 4): DataFrame = {
    val edges = TableWriter.readTable(spark, s"${prefix}_gedges")
    val v = TableWriter.readTable(spark, s"${prefix}_gvectors")
    val entry = TableWriter.readTable(spark, s"${prefix}_gentry")
    val q = unitize(queries)
    // identity hint: the stored side must NOT be broadcast — reading
    // it in place through the bucketed layout is the whole point
    val visited = GraphAnn.searchGraph(edges, v, q, entry, beam, hops,
      better, identity)
    GraphAnn.topK(visited, k, "cosine", -col("d"))
  }

  /** FILTERED search (the filtered-DiskANN / vector-store rule):
    * traverse the FULL stored graph — restricting traversal to
    * matching nodes would fragment it into islands the entry points
    * can't reach — and apply the metadata predicate only at
    * ADMISSION, so non-matching nodes still act as stepping stones.
    * `meta` is any (vec_id, …) frame; `pred` a boolean Column over
    * it. Post-filtering trades recall at a fixed budget when the
    * matching class is rare — raise `beam`/`hops` to compensate (the
    * spec measures the boosted budget recovering recall); the
    * IVF-side pre-filter twin (q_knn_filtered) is the oracled
    * complement. Admission is a semi-join against the filtered
    * metadata — budget-sized, never corpus-sized. */
  def searchWhere(spark: SparkSession, queries: DataFrame, prefix: String,
                  meta: DataFrame, pred: Column,
                  k: Int = 5, beam: Int = 12, hops: Int = 4): DataFrame = {
    val edges = TableWriter.readTable(spark, s"${prefix}_gedges")
    val v = TableWriter.readTable(spark, s"${prefix}_gvectors")
    val entry = TableWriter.readTable(spark, s"${prefix}_gentry")
    val q = unitize(queries)
    val visited = GraphAnn.searchGraph(edges, v, q, entry, beam, hops,
      better, identity)
    val admissible = meta.filter(pred).select(col("vec_id").as("dst"))
    GraphAnn.topK(visited.join(admissible, Seq("dst"), "left_semi"),
      k, "cosine", -col("d"))
  }

  /** Fold a batch of new vectors into the stored graph (the HNSW
    * insert): each new vector's stored-graph neighborhood (via
    * [[search]]'s machinery, budget-bounded) becomes its out-edges,
    * reversed edges make it reachable, and its vectors join the
    * scoring table. O(batch · probe budget); the stored tables are
    * appended, never rewritten. Batch ids must be fresh. */
  def insert(spark: SparkSession, batch: DataFrame, prefix: String,
             buckets: Int = 8, degree: Int = 10, beam: Int = 12,
             hops: Int = 4): Unit = {
    val found = search(spark, batch, prefix, k = degree, beam, hops)
      .select(col("query_id").as("src"), col("neighbor_id").as("dst"))
      .persistTracked()
    val newEdges = found.unionByName(
      found.select(col("dst").as("src"), col("src").as("dst")))
    TableWriter.appendBucketed(newEdges, s"${prefix}_gedges", buckets, "src")
    TableWriter.appendBucketed(unitize(batch), s"${prefix}_gvectors",
      buckets, "vec_id")
  }

  /** Maintenance: re-rank every node to its best `degree` out-edges
    * (inserts accumulate reverse edges past the bound) and rewrite
    * both big tables at one file per bucket — [[EmbedIndex
    * .compactIndex]]'s contract plus the degree restore. */
  def compactIndex(spark: SparkSession, prefix: String, buckets: Int = 8,
                   degree: Int = 10): Unit = {
    val v = TableWriter.readTable(spark, s"${prefix}_gvectors")
    val ranked = GraphAnn.bestPerSrc(
        TableWriter.readTable(spark, s"${prefix}_gedges").distinct(),
        v, degree, better, identity)
      .select(col("src"), col("dst"))
    for ((table, key, df) <- Seq(
        (s"${prefix}_gedges", "src", ranked),
        (s"${prefix}_gvectors", "vec_id", v))) {
      val tmp = s"${table}_compact_tmp"
      TableWriter.writeBucketed(
        df.repartition(buckets, col(key)), tmp, buckets, key)
      spark.sql(s"DROP TABLE $table")
      spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
    }
  }
}
