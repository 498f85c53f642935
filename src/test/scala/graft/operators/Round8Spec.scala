package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Round-8 registrations: BM25 retrieval, DSIR-style importance
  * weights, per-domain caps, blocked-ER exact embedding dedup — the
  * semantic edges (length normalization, contrast sign, cap/tie
  * behavior, blocking isolation) on tiny crafted corpora. */
class Round8Spec extends SparkSpec {
  import spark.implicits._

  private def docTables(rows: Seq[(Long, String, String, String)]): Tables = {
    val dir = java.nio.file.Files.createTempDirectory("graft-docs8").toString
    rows.toDF("doc_id", "text", "source", "lang")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Tables(spark, dir)
  }

  private def embTables(rows: Seq[(Long, Seq[Float], Int)]): Tables = {
    val dir = java.nio.file.Files.createTempDirectory("graft-emb8").toString
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    Tables(spark, dir)
  }

  test("bm25: tf raises the score, length normalization lowers it") {
    val t = docTables(Seq(
      (1L, "apple apple b", "s", "en"),          // f=2, dl=3
      (2L, "apple c c c", "s", "en"),            // f=1, dl=4
      (3L, "apple b", "s", "en"),                // f=1, dl=2
      (4L, "apple b b b b b b b b b", "s", "en"),// f=1, dl=10 (long)
      (5L, "x y z", "s", "en")))                 // no hit
    val r = Retrieval.bm25(t, terms = Seq("apple"), k = 10)
      .select("doc_id", "n_terms_hit", "score_micro").as[(Long, Long, Long)]
      .collect().toSeq
    assert(r.map(_._1).toSet == Set(1L, 2L, 3L, 4L)) // doc 5 never scores
    assert(r.forall(_._2 == 1L))
    val byDoc = r.map(x => x._1 -> x._3).toMap
    assert(byDoc(1L) > byDoc(3L)) // more hits beat fewer at similar dl
    assert(byDoc(3L) > byDoc(2L)) // same f, shorter doc wins
    assert(byDoc(2L) > byDoc(4L)) // same f, much longer doc loses
    assert(r.map(_._3) == r.map(_._3).sorted.reverse) // emitted rank order
  }

  test("bm25 matches the closed-form rational formula") {
    val t = docTables(Seq(
      (1L, "apple apple b", "s", "en"),
      (2L, "apple c c c", "s", "en"),
      (3L, "x y z", "s", "en")))
    // n=3 docs, tt=10 tokens, df=2; shared-text formula in doubles
    def score(f: Double, dl: Double, df: Double, n: Double, tt: Double): Long =
      math.floor(1000000.0 *
        ((2 * n - 2 * df + 1) * 22.0 * f * tt) /
        ((2 * df + 1) * (10.0 * f * tt + 3.0 * tt + 9.0 * dl * n))).toLong
    val got = Retrieval.bm25(t, terms = Seq("apple"), k = 10)
      .select("doc_id", "score_micro").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> score(2, 3, 2, 3, 10), 2L -> score(1, 4, 2, 3, 10)))
  }

  test("dsir: documents sharing target-language bigrams score positive, others negative") {
    val t = docTables(Seq(
      (1L, "good token good token", "s", "en"),
      (2L, "good token good token", "s", "en"),
      (3L, "bad stuff bad stuff", "s", "fr"),
      (4L, "bad stuff bad stuff", "s", "fr")))
    val r = Retrieval.dsirWeights(t).select("doc_id", "score")
      .as[(Long, Long)].collect().toMap
    // en bigrams: ppm_target > ppm_raw (they are ALL of the target mass,
    // half the raw mass); fr bigrams have zero target mass
    assert(r(1L) > 0 && r(2L) > 0)
    assert(r(3L) < 0 && r(4L) < 0)
    assert(r(1L) == r(2L) && r(3L) == r(4L)) // identical docs, identical weights
  }

  test("domainCap: cap binds per source, best-by-chars survive, ties to low doc_id") {
    val big = (1L to 15L).map(i => (i, "x" * (100 + i.toInt), "A", "en"))
    val small = (100L to 102L).map(i => (i, "y" * 50, "B", "en"))
    val t = docTables(big ++ small)
    val a = Curation.domainCap(t, cap = 10).filter(col("source") === "A")
      .select("n_kept", "chars_kept", "chars_dropped").as[(Long, Long, Long)].head()
    // A: keeps the 10 LARGEST docs (chars 106..115), drops 101..105
    assert(a == ((10L, (106 to 115).map(_ + 0L).sum, (101 to 105).map(_ + 0L).sum)))
    val b = Curation.domainCap(t, cap = 10).filter(col("source") === "B")
      .select("n_kept", "chars_dropped").as[(Long, Long)].head()
    assert(b == ((3L, 0L))) // under-cap domain keeps everything
  }

  test("embedDedupExact: identical pair found within block, blocking isolates labels") {
    val t = embTables(Seq(
      (1L, Seq(1.0f, 0.0f), 1),
      (2L, Seq(1.0f, 0.0f), 1),  // duplicate of 1, same block
      (3L, Seq(0.0f, 1.0f), 1),  // orthogonal, same block
      (4L, Seq(1.0f, 0.0f), 2))) // duplicate of 1, DIFFERENT block
    val r = Dedup.embedDedupExact(t)
      .select("id_a", "id_b", "cos_ppm").as[(Long, Long, Long)].collect().toSeq
    assert(r == Seq((1L, 2L, 1000000L)))
  }

  test("semDedup: transitive closure keeps one representative per semantic cluster") {
    val t = embTables(Seq(
      (1L, Seq(1.0f, 0.0f), 1),
      (2L, Seq(1.0f, 0.0f), 1),
      (3L, Seq(1.0f, 0.02f), 1), // near-dup of 1 and 2 (chain closes anyway)
      (4L, Seq(0.0f, 1.0f), 1),  // orthogonal singleton — not listed
      (5L, Seq(1.0f, 0.0f), 2))) // other block — own (singleton) world
    val r = Dedup.semDedup(t)
      .select("vec_id", "cluster_id", "cluster_size", "keep")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq((1L, 1L, 3L, 1L), (2L, 1L, 3L, 0L), (3L, 1L, 3L, 0L)))
  }

  test("gopherRules: each rule independently gates the pass bit") {
    val t = docTables(Seq(
      (1L, "the cats sat down and ate", "s", "en"),            // passes all (mean wlen 20/6)
      (2L, "the cat", "s", "en"),                              // too few words
      (3L, "11 22 33 44 55 66", "s", "en"),                    // no alpha, no stopwords
      (4L, ("the " + "abcdefghijklmnopqrstuvwxyzabcd " * 4 + "a").trim, "s", "en"), // mean wlen > 10
      (5L, "cat sat mat dog log bog", "s", "en")))             // <2 stopwords
    val r = TextAnalysis.gopherRules(t)
      .select("doc_id", "pass").as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 1L, 2L -> 0L, 3L -> 0L, 4L -> 0L, 5L -> 0L))
  }

  test("gopherRules: ppm measurements are exact integer floor division") {
    val t = docTables(Seq((1L, "ab cde f", "s", "en"))) // 3 words, 6 chars
    val r = TextAnalysis.gopherRules(t)
      .select("n_words", "mean_wlen_micro", "alpha_ppm", "n_stop")
      .as[(Long, Long, Long, Long)].head()
    assert(r == ((3L, 2000000L, 1000000L, 0L)))
  }

  test("embedDedupExact: micro-int cosine equals double cosine to ppm precision") {
    val rng = new scala.util.Random(7)
    val vecs = (1L to 20L).map(i =>
      (i, Seq.fill(16)(rng.nextGaussian().toFloat), 1))
    val t = embTables(vecs)
    val got = Dedup.embedDedupExactPairs(t.embeddings, thresholdPpm = -2000000L)
      .select("id_a", "id_b", "cos_ppm").as[(Long, Long, Long)].collect()
    val byPair = got.map(x => (x._1, x._2) -> x._3).toMap
    assert(got.length == 190) // all 20·19/2 pairs emitted at no-op threshold
    for {
      (ia, va, _) <- vecs; (ib, vb, _) <- vecs if ia < ib
    } {
      val dot = va.zip(vb).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(va.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(vb.map(x => x.toDouble * x.toDouble).sum)
      val cosPpm = 1000000.0 * dot / (na * nb)
      // micro quantization of the inputs perturbs the cosine by <2ppm
      assert(math.abs(byPair((ia, ib)) - cosPpm) <= 2.0, s"pair ($ia,$ib)")
    }
  }

  test("vocabPrune: df thresholds gate both tails, order survives") {
    // df ppm: common=3/3=1e6 (pruned high), mid=2/3=666666 (kept under
    // the 700000 cap), rare/solo=1/3 (pruned low by minDf=2)
    val t = docTables(Seq(
      (1L, "common mid rare common", "s", "en"),
      (2L, "mid common", "s", "en"),
      (3L, "common solo", "s", "en")))
    val r = TextAnalysis.vocabPrune(t, minDf = 2L, maxDfPpm = 700000L)
      .select("doc_id", "n_kept", "n_dropped", "text_pruned")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(r == Seq(
      (1L, 1L, 3L, "mid"),       // common(df3) high-pruned, rare(df1) low-pruned
      (2L, 1L, 1L, "mid"),
      (3L, 0L, 2L, "")))         // every token pruned → empty doc kept in output
  }

  test("vocabPrune: kept tokens preserve original positions") {
    val t = docTables(Seq(
      (1L, "b a b c a", "s", "en"),
      (2L, "a c b", "s", "en")))
    // all tokens df>=2? a:2 b:2 c:2 docs → keep all with wide thresholds
    val r = TextAnalysis.vocabPrune(t, minDf = 1L, maxDfPpm = 1000000L)
      .select("text_pruned").as[String].collect().toSeq
    assert(r == Seq("b a b c a", "a c b"))
  }

  test("wordDrift: exact ppm contrast and deterministic tie order") {
    val t = docTables(Seq(
      (2L, "x x x y", "s", "en"),  // grp 0: x=3 y=1 (tot 4)
      (1L, "x y y y", "s", "en"))) // grp 1: x=1 y=3 (tot 4)
    val r = TextAnalysis.wordDrift(t, k = 10)
      .select("tok", "cnt_a", "cnt_b", "ppm_a", "ppm_b", "drift")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq(
      ("x", 3L, 1L, 750000L, 250000L, 500000L),
      ("y", 1L, 3L, 250000L, 750000L, -500000L)))
  }

  test("coocWindow: pairs only within the window, unordered canonical") {
    // "a b c d e" window=2: ab ac bc bd cd ce de = 7 pairs; no ad/ae/be
    val t = docTables(Seq((1L, "a b c d e", "s", "en")))
    val r = TextAnalysis.coocWindow(t, window = 2, k = 100)
      .select("w1", "w2", "n_cooc").as[(String, String, Long)].collect().toSet
    assert(r == Set(("a", "b", 1L), ("a", "c", 1L), ("b", "c", 1L),
      ("b", "d", 1L), ("c", "d", 1L), ("c", "e", 1L), ("d", "e", 1L)))
  }

  test("coocWindow: single-token docs contribute nothing; repeats count") {
    val t = docTables(Seq(
      (1L, "solo", "s", "en"),
      (2L, "p q p", "s", "en"))) // pairs: pq, pp, pq → (p,q)=2 (p,p)=1
    val r = TextAnalysis.coocWindow(t, window = 2, k = 10)
      .select("w1", "w2", "n_cooc").as[(String, String, Long)].collect().toSet
    assert(r == Set(("p", "q", 2L), ("p", "p", 1L)))
  }

  test("spanCorrupt: rate 0 is identity, rate 100 is one whole-doc span") {
    val t = docTables(Seq((7L, "alpha beta gamma", "s", "en")))
    val id = TextAnalysis.spanCorrupt(t, ratePct = 0)
      .select("corrupted", "n_masked", "n_spans")
      .as[(String, Long, Long)].head()
    assert(id == (("alpha beta gamma", 0L, 0L)))
    val all = TextAnalysis.spanCorrupt(t, ratePct = 100)
      .select("corrupted", "n_masked", "n_spans")
      .as[(String, Long, Long)].head()
    assert(all == (("<extra_id_0>", 3L, 1L)))
  }

  test("spanCorrupt: sentinels are numbered runs; counts reconcile") {
    val t = docTables((1L to 20L).map(i =>
      (i, (1 to 30).map(j => s"w$j").mkString(" "), "s", "en")))
    val r = TextAnalysis.spanCorrupt(t, ratePct = 40)
      .select("corrupted", "n_masked", "n_spans")
      .as[(String, Long, Long)].collect()
    r.foreach { case (c, nm, ns) =>
      val toks = c.split(" ").toSeq
      val sent = toks.filter(_.startsWith("<extra_id_"))
      assert(sent.size == ns)          // one sentinel per masked run
      assert(sent == (0 until ns.toInt).map(k => s"<extra_id_$k>")) // L→R numbering
      assert(toks.size - sent.size == 30 - nm) // survivors = unmasked tokens
      assert(ns <= nm)
    }
    assert(r.map(_._2).sum > 0) // the 40% coin actually fires somewhere
  }

  test("pageRank: 5 integer rounds reproduce the hand-checked ranks") {
    import spark.implicits._
    // path 1-2-3 plus pair 4-5 (symmetric): center node 2 accumulates
    // both leaves' mass; the 4-5 pair is a fixpoint at 1e6 each.
    // Expected values independently computed with exact bigint floor
    // arithmetic (p' = 150000 + 850·Σ(p DIV d) DIV 1000, 5 rounds).
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L))
    val edges = (pairs.map { case (a, b) => (a, b) } ++
      pairs.map { case (a, b) => (b, a) }).toDF("src", "dst")
    val r = Components.pageRank(edges, iters = 5)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(r == Seq((1L, 668336L), (2L, 1663323L), (3L, 668336L),
      (4L, 1000000L), (5L, 1000000L)))
  }

  test("lshAudit: identical docs estimate exactly, errors stay signed ppm") {
    val t = docTables(Seq(
      (1L, "one two three four five six", "s", "en"),
      (2L, "one two three four five six", "s", "en"),    // jaccard 1.0
      (3L, "one two three four five ten", "s", "en")))   // high-overlap
    val r = Dedup.lshAudit(t)
      .select("doc_a", "doc_b", "est_ppm", "exact_ppm", "err_ppm")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val exact = r.find(x => x._1 == 1L && x._2 == 2L).get
    assert(exact._3 == 1000000L && exact._4 == 1000000L && exact._5 == 0L)
    r.foreach { case (_, _, est, ex, err) =>
      assert(est >= 0L && est <= 1000000L)
      assert(ex >= 0L && ex <= 1000000L)
      assert(err == est - ex)
    }
  }

  test("splitAssign: totals reconcile; degenerate boundaries route all") {
    val t = docTables((1L to 50L).map(i =>
      (i, s"tok$i tok${i + 1} tok${i + 2}", "s", "en")))
    val r = Curation.splitAssign(t)
      .select("split", "n_docs", "n_tokens", "share_ppm")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(r.map(_._2).sum == 50L)           // every doc in exactly one split
    assert(r.map(_._3).sum == 150L)          // 3 tokens per doc
    r.foreach { case (_, nd, _, sp) => assert(sp == nd * 1000000L / 50L) }
    val allTest = Curation.splitAssign(t, trainPpm = 0L, valPpm = 0L)
      .select("split", "n_docs").as[(String, Long)].collect().toSeq
    assert(allTest == Seq(("test", 50L)))
  }

  test("centroidUpdate: exact micro means, FLOOR is toward -inf") {
    val t = embTables(Seq(
      (1L, Seq(1.0f, -1.0f), 1),
      (2L, Seq(0.5f, 0.000001f), 1),  // dim1 snaps to 1 micro
      (3L, Seq(2.0f, 2.0f), 2)))
    val r = Similarity.centroidUpdate(t)
      .select("label", "dim", "n", "centroid_micro")
      .as[(Long, Int, Long, Long)].collect().toSeq
    assert(r == Seq(
      (1L, 0, 2L, 750000L),   // (1000000 + 500000) / 2
      (1L, 1, 2L, -500000L),  // (-1000000 + 1) / 2 = -499999.5 → FLOOR -500000
      (2L, 0, 1L, 2000000L),
      (2L, 1, 1L, 2000000L)))
  }

  test("sourceDupMatrix: pairs roll up by unordered source pair") {
    val dup = "one two three four five six"
    val t = docTables(Seq(
      (1L, dup, "B", "en"), (2L, dup, "B", "en"), (3L, dup, "B", "en"),
      (4L, "alpha beta gamma delta epsilon", "A", "en"),
      (5L, "alpha beta gamma delta epsilon", "B", "en"),
      (6L, "lone wolf text here", "C", "en")))
    val r = Dedup.sourceDupMatrix(t)
      .select("source_a", "source_b", "n_pairs")
      .as[(String, String, Long)].collect().toSeq
    assert(r == Seq(("B", "B", 3L), ("A", "B", 1L)))
  }

  test("substrDedup: keep-first passage removal, unaligned coverage") {
    val a = (1 to 20).map(j => s"a$j")
    val t = docTables(Seq(
      (1L, a.mkString(" "), "s", "en"),                       // keeper copy
      (2L, a.mkString(" "), "s", "en"),                       // exact dup → emptied
      // interior 12-token run a5..a16 at a different offset → unaligned hit
      (3L, ("b1 b2 " + a.slice(4, 16).mkString(" ") + " c1 c2"), "s", "en"),
      (4L, "short doc under ten tokens here now", "s", "en"))) // n<k untouched
    val r = Dedup.substrDedup(t)
      .select("doc_id", "n_tok", "n_removed", "cleaned")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(r(0) == ((1L, 20L, 0L, a.mkString(" "))))  // first occurrence kept
    assert(r(1) == ((2L, 20L, 20L, "")))              // full duplicate removed
    assert(r(2) == ((3L, 16L, 12L, "b1 b2 c1 c2")))   // only the shared run cut
    assert(r(3)._3 == 0L)                             // too short to match
  }

  test("spanIslands: interval union matches substrDedup's removed counts") {
    val a = (1 to 20).map(j => s"a$j")
    val t = docTables(Seq(
      (1L, a.mkString(" "), "s", "en"),
      (2L, a.mkString(" "), "s", "en"),
      (3L, ("b1 b2 " + a.slice(4, 16).mkString(" ") + " c1 c2"), "s", "en"),
      (4L, "short doc under ten tokens here now", "s", "en")))
    val r = Dedup.spanIslands(t)
      .select("doc_id", "n_spans", "n_islands", "covered_tok")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // doc1 holds every keeper, doc4 is sub-k: neither emits spans
    assert(r == Seq((2L, 11L, 1L, 20L), (3L, 3L, 1L, 12L)))
    // the interval union equals what substrDedup actually removed
    val removed = Dedup.substrDedup(t)
      .select("doc_id", "n_removed").as[(Long, Long)].collect()
      .filter(_._2 > 0).toSeq
    assert(removed == r.map(x => (x._1, x._4)))
  }

  test("pqEncode: identical vectors quantize losslessly; codes well-formed") {
    val v = Seq.fill(16)(0.25f)
    val same = embTables((1L to 20L).map(i => (i, v, 1)))
    val enc = Similarity.pqEncode(same)
      .select("vec_id", "code", "err_micro2")
      .as[(Long, String, Long)].collect().toSeq
    assert(enc.size == 20)
    enc.foreach { case (_, code, err) =>
      assert(err == 0L)                      // centroid == the shared subvector
      val parts = code.split(",")
      assert(parts.length == 2)              // 16 dims / 8 per subspace
      parts.foreach(p => assert(p.toInt >= 0 && p.toInt < 16))
    }
    val rng = new scala.util.Random(11)
    val mixed = embTables((1L to 30L).map(i =>
      (i, Seq.fill(16)(rng.nextGaussian().toFloat), 1)))
    val enc2 = Similarity.pqEncode(mixed)
      .select("err_micro2").as[Long].collect()
    assert(enc2.forall(_ >= 0L) && enc2.exists(_ > 0L))
  }

  test("softDedup: near-dup clusters share down-weight, singletons keep 1e6") {
    val t = docTables(Seq(
      (1L, "one two three four five", "s", "en"),
      (2L, "one two three four five", "s", "en"),   // exact near-dup of 1
      (3L, "six seven eight nine ten", "s", "en"))) // singleton
    val r = Dedup.softDedup(t)
      .select("doc_id", "cluster_size", "weight_ppm")
      .as[(Long, Long, Long)].collect().toSeq
    assert(r == Seq((1L, 2L, 500000L), (2L, 2L, 500000L), (3L, 1L, 1000000L)))
  }
}
