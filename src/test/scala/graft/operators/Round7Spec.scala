package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Round-7 registrations: blockDedup, chunkOverlap, repetition,
  * pmiColloc, mixtureWeights — boundary cases the sf oracles can't pin
  * (exact tie semantics, tail chunks, threshold edges) on tiny crafted
  * corpora. */
class Round7Spec extends SparkSpec {
  import spark.implicits._

  /** Crafted documents table written to a temp dir so the operators see
    * the same parquet-backed `Tables` shape the driver uses. */
  private def docTables(rows: Seq[(Long, String, String)]): Tables = {
    val dir = java.nio.file.Files.createTempDirectory("graft-docs").toString
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Tables(spark, dir)
  }

  test("chunkOverlap: stride grid with short tail chunk") {
    val t = docTables(Seq((1L, (1 to 10).map(i => s"t$i").mkString(" "), "s")))
    val r = Curation.chunkOverlap(t, size = 4, stride = 3)
      .select("chunk_id", "n_tok").as[(Long, Long)].collect().toSeq
    // starts 0,3,6,9 over 10 tokens: three full chunks, tail of 1
    assert(r == Seq((0L, 4L), (1L, 4L), (2L, 4L), (3L, 1L)))
  }

  test("chunkOverlap: stride==size partitions the tokens exactly, no overlap") {
    val t = docTables(Seq((1L, (1 to 10).map(i => s"t$i").mkString(" "), "s")))
    val r = Curation.chunkOverlap(t, size = 5, stride = 5)
    assert(r.count() == 2)
    assert(r.agg(sum("n_tok")).as[Long].head() == 10L)
    // disjoint chunks of distinct tokens never collide
    assert(r.select("chunk_hash").distinct().count() == 2)
  }

  test("blockDedup: global first occurrence (min doc_id, block_idx) is the keeper") {
    val t = docTables(Seq(
      (1L, "a b c a b c", "s"), // block 0 and block 1 identical
      (2L, "a b c x y z", "s"))) // block 0 duplicates doc 1's, block 1 unique
    val r = Dedup.blockDedup(t, block = 3)
      .select("doc_id", "n_blocks", "n_kept", "n_dropped")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // doc 1 keeps only its first copy of "a b c"; doc 2's copy also drops
    assert(r == Seq((1L, 2L, 1L, 1L), (2L, 2L, 1L, 1L)))
  }

  test("repetition: per-gram-size totals and top fraction; short docs emit no row") {
    val t = docTables(Seq((1L, "x x x y", "s"), (2L, "p q", "s")))
    val r = TextAnalysis.repetition(t)
      .select("doc_id", "gram_n", "n_grams", "top_count")
      .as[(Long, Int, Long, Long)].collect().toSeq
    assert(r == Seq(
      (1L, 1, 4L, 3L), (1L, 2, 3L, 2L), (1L, 3, 2L, 1L),
      (2L, 1, 2L, 1L), (2L, 2, 1L, 1L))) // no trigram row for a 2-token doc
  }

  test("pmiColloc: bigram at exactly minCount survives, below drops; integer PMI exact") {
    val t = docTables(Seq((1L, "a b", "s"), (2L, "a b", "s"), (3L, "c d", "s")))
    val r = TextAnalysis.pmiColloc(t, k = 10, minCount = 2)
      .select("g", "c_xy", "c_x", "c_y", "pmi_ppm")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // N=3 bigrams; "c d" (count 1) is under minCount; pmi = 2*3*1e6 / (2*2)
    assert(r == Seq(("a b", 2L, 2L, 2L, 1500000L)))
  }

  test("doclenHist: power-of-two buckets have exact boundaries") {
    val t = docTables(Seq(
      (1L, "a", "s"), (2L, "a b", "s"), (3L, "a b c", "s"), (4L, "a b c d", "s")))
    val r = TextAnalysis.doclenHist(t)
      .select("bucket", "lo", "hi", "n_docs", "sum_tokens")
      .as[(Int, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq((1, 1L, 1L, 1L, 1L), (2, 2L, 3L, 2L, 5L), (3, 4L, 7L, 1L, 4L)))
  }

  test("bpePairs: pair counts weight by word frequency, repeats inside a word count each") {
    val t = docTables(Seq((1L, "aaa ab aaa", "s")))
    val r = TextAnalysis.bpePairs(t, k = 10)
      .select("pair", "n_occ", "n_types").as[(String, Long, Long)].collect().toSeq
    // "aaa" (count 2) contributes "aa" twice per occurrence → 4; "ab" once
    assert(r == Seq(("aa", 4L, 1L), ("ab", 1L, 1L)))
  }

  test("sourceAudit: exact integer share and single-division mean") {
    val t = docTables(Seq(
      (1L, "a b c", "A"), (2L, "a b c d e f", "A"), (3L, "x", "B")))
    val r = Curation.sourceAudit(t)
      .select("source", "n_docs", "src_tokens", "mean_tokens", "share_ppm")
      .as[(String, Long, Long, Double, Long)].collect().toSeq
    assert(r == Seq(("A", 2L, 9L, 4.5, 666666L), ("B", 1L, 1L, 1.0, 333333L)))
  }

  test("embedStats: micro-unit snap gives exact integer moments") {
    val dir = java.nio.file.Files.createTempDirectory("graft-emb").toString
    Seq((1L, Array(0.5f, -0.25f)), (2L, Array(0.25f, 0.75f)))
      .toDF("vec_id", "embedding")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = Similarity.embedStats(Tables(spark, dir))
      .select("dim", "n_vals", "sum_micro", "min_micro", "max_micro", "mean")
      .as[(Int, Long, Long, Long, Long, Double)].collect().toSeq
    assert(r == Seq(
      (0, 2L, 750000L, 250000L, 500000L, 0.375),
      (1, 2L, 500000L, -250000L, 750000L, 0.25)))
  }

  test("seqPack: docs span cut points; fills are exact and sum to the corpus") {
    def doc(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val t = docTables(Seq(
      (1L, doc(3), "s"), (2L, doc(4), "s"), (3L, doc(6), "s"), (4L, doc(2), "s")))
    val r = Curation.seqPack(t, seqLen = 5L)
      .select("seq_id", "n_docs", "n_full_docs", "fill_tokens", "first_doc", "last_doc")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // stream of 15 tokens in doc order → 3 exactly-full sequences;
    // docs 2 and 3 straddle the cuts, docs 1 and 4 sit fully inside
    assert(r == Seq(
      (0L, 2L, 1L, 5L, 1L, 2L),
      (1L, 2L, 0L, 5L, 2L, 3L),
      (2L, 2L, 1L, 5L, 3L, 4L)))
  }

  test("winnowing: fingerprint density below gram density; single-gram doc keeps its hash") {
    val long = (1 to 60).map(i => s"tok$i").mkString(" ")
    val t = docTables(Seq((1L, long, "s"), (2L, long, "s"), (3L, "a b c d", "s")))
    val r = TextAnalysis.winnowing(t)
      .select("doc_id", "n_grams", "n_fp", "min_fp", "fp_sig")
      .as[(Long, Long, Long, String, String)].collect()
    val byId = r.map(x => x._1 -> x).toMap
    // identical docs → identical fingerprint digests
    assert(byId(1L)._5 == byId(2L)._5 && byId(1L)._4 == byId(2L)._4)
    // winnowing selects ~2/(w+1) of grams — far fewer than all of them
    assert(byId(1L)._2 == 57L && byId(1L)._3 < 30L)
    // a doc with exactly k tokens has one gram, which IS its fingerprint
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest("a b c d".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(byId(3L)._2 == 1L && byId(3L)._3 == 1L && byId(3L)._4 == expect)
  }

  test("slidingMin kernel equals the declarative HOF spelling on real docs") {
    import graft.functions.TextFunctions
    val hs = transform(TextFunctions.wordNgramsOf(
      TextFunctions.tokens(col("text")), 4), g => md5(g))
    val df = tables.documents.limit(200)
      .select(col("doc_id"), hs.as("hs"))
      .filter(size(col("hs")) > 0)
      .select(col("doc_id"),
        TextFunctions.slidingMin(col("hs"), 5).as("kernel"),
        transform(sequence(lit(1), greatest(size(col("hs")) - 4, lit(1))),
          j => array_min(slice(col("hs"), j, lit(5)))).as("hof"))
    assert(df.filter(col("kernel") =!= col("hof")).count() == 0)
    assert(df.count() > 0)
  }

  test("dedupClusters: transitive near-dup chain collapses into one cluster") {
    val base = "spark catalyst optimizes declarative plans into distributed " +
      "executions across many partitions and executors with codegen enabled today"
    val t = docTables(Seq(
      (1L, base, "s"),
      (2L, base.replace("codegen", "vectorization"), "s"), // near-dup of 1
      (3L, base.replace("codegen", "vectorization")
        .replace("declarative", "logical"), "s"), // near-dup of 2, farther from 1
      (4L, "entirely different content about zip archives and geometry " +
        "rings with areas and shapefile decoding logic", "s")))
    val r = Dedup.dedupClusters(t)
      .select("doc_id", "cluster_id", "cluster_size")
      .as[(Long, Long, Long)].collect().toSeq
    // docs 1-3 form one cluster labeled by the min id; doc 4 is absent
    assert(r.forall(_._1 != 4L))
    val chain = r.filter(x => Set(1L, 2L, 3L)(x._1))
    assert(chain.map(_._2).distinct == Seq(1L))
    assert(chain.forall(_._3 == chain.size.toLong))
  }

  test("mixtureWeights: uniform target, ppm cap binds on tiny sources, bigint-exact") {
    def doc(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val t = docTables(Seq(
      (1L, doc(10), "A"), (2L, doc(10), "A"), (3L, doc(10), "A"),
      (4L, doc(10), "B"),
      (5L, doc(1), "C")))
    val r = Curation.mixtureWeights(t)
      .select("source", "src_tokens", "target_tokens", "weight_ppm", "sampled_tokens")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // total=41, 3 sources → target = 41 DIV 3 = 13
    assert(r == Seq(
      ("A", 30L, 13L, 433333L, 12L),  // 13e6 DIV 30;  30*433333 DIV 1e6
      ("B", 10L, 13L, 1300000L, 13L),
      ("C", 1L, 13L, 4000000L, 4L))) // 13e6 DIV 1 capped at 4e6
  }
}
