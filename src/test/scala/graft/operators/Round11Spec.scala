package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-11 operators: one-permutation MinHash, overlap-coefficient
  * containment, priority sampling. */
class Round11Spec extends SparkSpec {
  import spark.implicits._

  private val base = "spark catalyst optimizes declarative plans into distributed executions across many partitions and executors with codegen"

  // —— one-permutation MinHash ——

  test("ophSignatures: 32 slots, no nulls, identical docs get identical sigs") {
    val docs = Seq((1L, base), (2L, base),
      (3L, "entirely different content about zip archives and geometry rings"))
      .toDF("doc_id", "text")
    val sigs = Dedup.ophSignatures(Dedup.shingled(docs, 3), 32)
      .select($"doc_id", $"sig").as[(Long, Seq[Long])].collect().toMap
    assert(sigs.size == 3)
    sigs.values.foreach { s => assert(s.length == 32 && s.forall(_ != null)) }
    assert(sigs(1L) == sigs(2L)) // exact dup -> identical shingles -> identical sig
    assert(sigs(1L) != sigs(3L))
  }

  test("ophSignatures: borrowed-slot count equals 32 minus occupied bins") {
    // a short doc hits few bins; every empty bin must be densified with
    // an offset >= P31, and genuine minima stay < P31 (31-bit hashes)
    val docs = Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val sh = Dedup.shingled(docs, 3)
    val occupied = sh.select(explode($"sh").as("g"))
      .select((Dedup.xxHash31($"g") % 32).cast("int").as("bin"))
      .distinct().count()
    val sig = Dedup.ophSignatures(sh, 32)
      .select($"sig").as[Seq[Long]].head()
    val borrowed = sig.count(_ >= Dedup.P31)
    assert(borrowed == 32 - occupied)
    // rotation offset is d*P31 + a genuine 31-bit min: decode each slot
    // as (d, v) and check v IS the min of the bin d steps to the right
    // (circularly) AND that d is the distance to the NEAREST occupied
    // bin — the rotation-densification contract
    val binMins = sh.select(explode($"sh").as("g"))
      .select(Dedup.xxHash31($"g").as("h"))
      .withColumn("bin", ($"h" % 32).cast("int"))
      .groupBy($"bin").agg(min($"h").as("m"))
      .as[(Int, Long)].collect().toMap
    sig.zipWithIndex.foreach { case (v, k) =>
      val d = (v / Dedup.P31).toInt
      assert(binMins.get((k + d) % 32).contains(v - d.toLong * Dedup.P31))
      assert((0 until d).forall(e => !binMins.contains((k + e) % 32)))
    }
  }

  test("ophPairs finds planted near-duplicates, skips unrelated docs") {
    val docs = Seq(
      (1L, base),
      (2L, base.replace("codegen", "vectorization")),
      (3L, "entirely different content about zip archives and geometry rings with areas"),
      (4L, base)
    ).toDF("doc_id", "text")
    val pairs = Dedup.ophPairs(docs, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("md5 OPH variant (the oracled instance) finds the exact dup") {
    val docs = Seq(
      (1L, base), (2L, base),
      (3L, "entirely different content about zip archives and geometry rings with areas")
    ).toDF("doc_id", "text")
    val pairs = Dedup.ophPairs(docs, threshold = 0.5,
        shingleHash = Dedup.md5Hash31, bandKeyOf = Dedup.bandKeysStr)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(pairs.contains((1L, 2L, 1.0)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  // —— overlap-coefficient containment ——

  test("containment: an embedded prefix scores overlap 1.0 where jaccard would not") {
    // 2 is a strict prefix of 1: every shingle of 2 is in 1, so
    // overlap = 1.0 while jaccard = |2|/|1| < 1
    val big = base + " plus trailing analysis material appended here"
    val docs = Seq(
      (1L, big),
      (2L, base),
      (3L, "entirely different content about zip archives and geometry rings with areas")
    ).toDF("doc_id", "text")
    val r = Dedup.containmentPairs(docs, threshold = 0.5)
      .select("doc_a", "doc_b", "overlap").as[(Long, Long, Double)].collect().toSet
    assert(r.contains((1L, 2L, 1.0)))
    assert(!r.exists(p => p._1 == 3L || p._2 == 3L))
  }

  // —— BPE training ——

  test("bpeTrain: round-2 election sees round-1's rewrite (merge applied)") {
    // vocab: abab(c=3), ab(c=2), cd(c=4).
    // round 1 pairs: (a,b) n=2·3+1·2=8 wins over (b,a) n=3 and (c,d) n=4.
    // rewrite: abab -> [ab,ab], ab -> [ab], cd stays [c,d].
    // round 2 over the REWRITTEN words: (c,d) n=4 beats (ab,ab) n=3 —
    // the old (b,a) pair must be gone or election is wrong.
    val docs = Seq(
      (1L, "abab abab abab ab ab cd cd cd cd")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.bpeTrainDocs(docs, rounds = 3)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(r == Seq((1, "a", "b", 8L), (2, "c", "d", 4L), (3, "ab", "ab", 3L)))
  }

  test("bpeTrain: greedy left-to-right fold does not re-merge within a round") {
    // "aaa": pairs (a,a) n=2·1. rewrite merges the FIRST two a's only:
    // [aa, a]; round 2's top pair is (aa, a) with n=1.
    val docs = Seq((1L, "aaa")).toDF("doc_id", "text")
    val r = TextAnalysis.bpeTrainDocs(docs, rounds = 2)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(r == Seq((1, "a", "a", 2L), (2, "aa", "a", 1L)))
  }

  test("bpeEncode: doc token counts shrink under the learned merges, never below words") {
    val t = tables
    val r = TextAnalysis.bpeEncode(t).as[(Long, Long, Long)].collect()
    assert(r.nonEmpty)
    r.foreach { case (_, nWords, nSyms) =>
      assert(nSyms >= nWords) // every word is >= 1 symbol
    }
    // the corpus char total strictly exceeds the encoded symbol total
    // (4 merges must bite somewhere on real text)
    val chars = t.documents
      .select(sum(size(split(regexp_replace($"text", " ", ""), ""))).cast("long"))
      .as[Long].head()
    val totalSyms = r.map(_._3).sum
    assert(totalSyms < chars, s"merges never applied: $totalSyms !< $chars")
  }

  // —— RRF hybrid fusion ——

  test("rrfFusion: fused score is exactly the sum of rank reciprocals, ordered") {
    val r = Retrieval.rrfFusion(tables)
      .as[(Long, Option[Long], Option[Long], Double)].collect().toSeq
    assert(r.nonEmpty && r.size <= 20)
    r.foreach { case (_, rb, rc, rrf) =>
      assert(rb.nonEmpty || rc.nonEmpty) // full-outer: in at least one list
      val expected = rb.map(x => 1.0 / (60L + x).toDouble).getOrElse(0.0) +
        rc.map(x => 1.0 / (60L + x).toDouble).getOrElse(0.0)
      assert(rrf == expected)
    }
    assert(r.map(_._4) == r.map(_._4).sorted.reverse) // descending
  }

  // —— full Lloyd k-means ——

  test("kmeans: 2 iterations converge the planted clusters, integers exact") {
    // init c0=v1=(0,0), c1=v2=(0.2,0). Iter-1 assigns v3,v4 to c1
    // (closer to v2 than v1); the M-step moves c1 to the mean of
    // {v2,v3,v4}; iter-2 re-assigns v2 to c0 — the loop must output
    // the POST-update assignment, not the first one.
    val emb = Seq(
      (1L, Seq(0f, 0f)), (2L, Seq(0.2f, 0f)),
      (3L, Seq(10f, 10f)), (4L, Seq(10.2f, 10f))
    ).toDF("vec_id", "embedding")
    val r = Similarity.kmeansOf(emb, k = 2, iters = 2)
      .as[(Long, Long, Long)].collect().toSeq
    // cluster 0 = {v1, v2}: inertia = 0 + 200000² = 4e10
    // cluster 1 = {v3, v4} vs c1=(6800000, 6666666):
    //   v3: 3200000² + 3333334² ; v4: 3400000² + 3333334²
    val c1Inertia = 3200000L * 3200000L + 3333334L * 3333334L +
      3400000L * 3400000L + 3333334L * 3333334L
    assert(r == Seq((0L, 2L, 40000000000L), (1L, 2L, c1Inertia)))
  }

  test("heavyHitters: CMS never underestimates; unique-bucket tokens are exact") {
    val t = tables
    val r = TextAnalysis.heavyHitters(t)
      .as[(String, Long, Long)].collect()
    assert(r.length == 20)
    r.foreach { case (tok, exact, cms) =>
      assert(cms >= exact, s"$tok: CMS underestimated ($cms < $exact)")
    }
    // exact ordering by n_exact desc is the top-k contract
    assert(r.map(_._2).toSeq == r.map(_._2).toSeq.sorted.reverse)
  }

  test("bloomDecontaminate: one-sided error — bloom never misses a true hit") {
    val r = TextAnalysis.bloomDecontaminate(tables)
      .as[(Long, Long, Long, Long)].collect()
    assert(r.nonEmpty)
    r.foreach { case (doc, nb, nt, nfp) =>
      assert(nb >= nt, s"doc $doc: bloom missed a true contamination")
      assert(nfp == nb - nt)
    }
    // the exact contamination set must be fully covered: every doc with
    // a true hit appears in the output (bloom-positive superset)
    val t = tables
    val sh = graft.operators.Dedup.shingled(
      t.documents.select($"doc_id", $"text"), 3)
      .select($"doc_id", explode($"sh").as("shingle"))
    val trueDocs = sh.filter($"doc_id" % 100 =!= 0)
      .join(sh.filter($"doc_id" % 100 === 0).select($"shingle").distinct(),
        Seq("shingle"), "left_semi")
      .select($"doc_id").distinct().as[Long].collect().toSet
    assert(trueDocs.subsetOf(r.map(_._1).toSet))
  }

  test("hllAudit: estimate lands within the p=10 error regime of exact") {
    val (m, exact, est, errPpm) = TextAnalysis.hllAudit(tables)
      .as[(Long, Long, Long, Long)].head()
    assert(m == 1024L && exact > 0)
    // raw HLL at 1024 registers: ~3.25% stddev when n/m is healthy;
    // sf0.001's shingle count sits near the small-range boundary, so
    // allow a generous-but-meaningful 25% envelope
    assert(math.abs(est - exact).toDouble / exact < 0.25,
      s"est $est vs exact $exact (err_ppm $errPpm)")
    assert(errPpm == math.floor((est - exact).toDouble * 1000000.0 / exact).toLong)
  }

  test("round-11 ops: no data-dependent broadcast hints") {
    // q_rrf_fusion is audited separately: its broadcast(qv) is one row
    // by construction (filter on the unique vec_id), which the
    // schema-level rule cannot see — assert its hint count explicitly
    // instead of exempting the file.
    val keys = Seq("q_dedup_minhash_oph", "q_dedup_minhash_oph_fast",
      "q_containment", "q_weighted_sample", "q_bpe_train", "q_bpe_encode",
      "q_kmeans", "q_heavy_hitters", "q_bloom_decontaminate", "q_hll_audit")
    val bad = keys.flatMap { name =>
      PlanGuards.unboundedHints(graft.SparkEntry.queries(name)(spark, sfDir))
        .map(v => s"$name: $v")
    }
    graft.CacheRegistry.drain()
    assert(bad.isEmpty, s"SF-linear broadcast hints found:\n${bad.mkString("\n")}")
    // exactly two known-bounded hints the schema rule can't classify:
    // bm25's per-term df table (≤|query terms| rows — bounded by the
    // query constant, grouped on term) and the cosine ranker's query
    // vector (one row — filter on the unique vec_id)
    val rrfHints = PlanGuards.unboundedHints(
      graft.SparkEntry.queries("q_rrf_fusion")(spark, sfDir))
    graft.CacheRegistry.drain()
    assert(rrfHints.size == 2 &&
      rrfHints.exists(_.contains("vec_id")) &&
      rrfHints.exists(_.contains("text")),
      s"unexpected rrf hints: $rrfHints")
  }

  // —— priority sampling ——

  test("weightedSample: exactly min(k, stratum size) rows per source") {
    val t = tables
    val perSource = Curation.weightedSample(t, k = 5)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    val sizes = t.documents.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(perSource.keySet == sizes.keySet)
    perSource.foreach { case (s, n) => assert(n == math.min(5L, sizes(s))) }
  }

  test("weightedSample: priorities equal the w*2^31/(h+1) formula bit-for-bit") {
    val t = tables
    val got = Curation.weightedSample(t, k = 5)
      .select($"doc_id", $"n_chars", $"priority")
      .as[(Long, Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, w, p) =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = md.take(4).map("%02x".format(_)).mkString
      val u = (java.lang.Long.parseLong(hex, 16) & 0x7FFFFFFFL) + 1L
      val expected = w.toDouble * 2147483648.0 / u.toDouble
      assert(p == expected, s"doc $id: got $p expected $expected")
    }
  }

  test("weightedSample: two-phase top-k equals the naive single-window result") {
    import org.apache.spark.sql.expressions.Window
    val t = tables
    val u = conv(substring(md5($"doc_id".cast("string")), 1, 8), 16, 10)
      .cast("long").bitwiseAND(lit(0x7FFFFFFFL)) + lit(1L)
    val naive = t.documents
      .select($"source", $"doc_id", $"n_chars")
      .withColumn("priority",
        $"n_chars".cast("double") * lit(2147483648.0) / u.cast("double"))
      .withColumn("rk", row_number().over(
        Window.partitionBy($"source").orderBy($"priority".desc, $"doc_id")))
      .filter($"rk" <= 5).drop("rk")
      .select($"source", $"doc_id").as[(String, Long)].collect().toSet
    val got = Curation.weightedSample(t, k = 5)
      .select($"source", $"doc_id").as[(String, Long)].collect().toSet
    assert(got == naive)
  }
}
