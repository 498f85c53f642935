package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Round-9 registrations: the last five TPC-H shapes (Q2, Q11, Q16,
  * Q20, Q21) on tiny crafted star schemas where every inclusion /
  * exclusion arm of the correlated predicate is exercised by exactly
  * one row. */
class Round9Spec extends SparkSpec {
  import spark.implicits._

  /** Writes the provided frames as `<name>.parquet` in a temp dir. */
  private def star(frames: (String, org.apache.spark.sql.DataFrame)*): Tables = {
    val dir = java.nio.file.Files.createTempDirectory("graft-star9").toString
    frames.foreach { case (name, df) =>
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$name.parquet")
    }
    Tables(spark, dir)
  }

  private def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")

  test("q21: only the sole-late supplier in a multi-supplier finished order counts") {
    val t = star(
      "nation" -> Seq((3L, "NATION_3"), (0L, "NATION_0"))
        .toDF("n_nationkey", "n_name"),
      "supplier" -> Seq(
        (1L, "S1", 3L), (2L, "S2", 3L), (9L, "S9", 0L))
        .toDF("s_suppkey", "s_name", "s_nationkey"),
      "orders" -> Seq(
        (1L, "F"),  // multi-supplier, only S1 late -> counted
        (2L, "F"),  // single-supplier              -> EXISTS fails
        (3L, "F"),  // two late suppliers           -> NOT EXISTS fails
        (4L, "O"),  // not finished                 -> status filter
        (5L, "F"))  // late supplier is S9 (wrong nation)
        .toDF("o_orderkey", "o_orderstatus"),
      "lineitem" -> Seq(
        (1L, 1L, "R"), (1L, 1L, "R"), (1L, 2L, "N"), // both S1 lines count
        (2L, 1L, "R"), (2L, 1L, "N"),
        (3L, 1L, "R"), (3L, 2L, "R"),
        (4L, 1L, "R"), (4L, 2L, "N"),
        (5L, 9L, "R"), (5L, 1L, "N"))
        .toDF("l_orderkey", "l_suppkey", "l_returnflag"))
    val r = TpcHShapes.q21Waiting(t, nation = "NATION_3")
      .select("s_name", "numwait").as[(String, Long)].collect().toSeq
    assert(r == Seq(("S1", 2L))) // per-line count, not per-order
  }

  test("q2: join-back keeps exactly the per-part regional min, ties both kept") {
    val t = star(
      "region" -> Seq((0L, "EUROPE"), (1L, "ASIA")).toDF("r_regionkey", "r_name"),
      "nation" -> Seq((1L, "N1", 0L), (2L, "N2", 1L))
        .toDF("n_nationkey", "n_name", "n_regionkey"),
      "supplier" -> Seq(
        (1L, "S1", 50.0, 1L), (2L, "S2", 40.0, 1L),
        (3L, "S3", 60.0, 1L), (4L, "S4", 99.0, 2L))
        .toDF("s_suppkey", "s_name", "s_acctbal", "s_nationkey"),
      "part" -> Seq((1L, "STANDARD", 10L), (2L, "PROMO", 10L))
        .toDF("p_partkey", "p_type", "p_size"),
      "lineitem" -> Seq(
        (1L, 1L, 5.0), (1L, 1L, 7.0), // S1 pair cost = min(5,7) = 5
        (1L, 2L, 5.0),                // S2 ties the min -> both kept
        (1L, 3L, 6.0),                // above min -> dropped
        (1L, 4L, 1.0),                // cheaper but outside region
        (2L, 1L, 2.0))                // part filtered by type
        .toDF("l_partkey", "l_suppkey", "l_extendedprice"))
    val r = TpcHShapes.q2MinCost(t, region = "EUROPE", ptype = "STANDARD")
      .select("s_name", "p_partkey", "supplycost")
      .as[(String, Long, Double)].collect().toSeq
    // ordered by s_acctbal desc: S1 (50) before S2 (40)
    assert(r == Seq(("S1", 1L, 5.0), ("S2", 1L, 5.0)))
  }

  test("q11: global-fraction threshold keeps only heavy parts of the nation's lines") {
    val t = star(
      "nation" -> Seq((7L, "NATION_7"), (0L, "NATION_0"))
        .toDF("n_nationkey", "n_name"),
      "supplier" -> Seq((1L, 7L), (2L, 0L)).toDF("s_suppkey", "s_nationkey"),
      "lineitem" -> Seq(
        (1L, 1L, 2.0, 10.0),  // part 1: value 20 > 0.5 * 21 -> kept
        (2L, 1L, 1.0, 1.0),   // part 2: value 1  < 10.5     -> dropped
        (3L, 2L, 9.0, 9.0))   // wrong nation: not in the total at all
        .toDF("l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"))
    val r = TpcHShapes.q11Important(t, nation = "NATION_7", fraction = 0.5)
      .select("p_partkey", "value").as[(Long, Double)].collect().toSeq
    assert(r == Seq((1L, 20.0)))
  }

  test("q16: complained suppliers anti-joined out, pairs distinct before counting") {
    val t = star(
      "supplier" -> Seq(
        (1L, "Supplier#1"), (2L, "Supplier#2"), (17L, "Supplier#17"))
        .toDF("s_suppkey", "s_name"),
      "part" -> Seq(
        (1L, "Brand#2", "STANDARD", 5L),
        (2L, "Brand#1", "STANDARD", 5L),   // excluded brand
        (3L, "Brand#2", "PROMO", 5L))      // excluded type prefix
        .toDF("p_partkey", "p_brand", "p_type", "p_size"),
      "lineitem" -> Seq(
        (1L, 1L), (1L, 1L),   // duplicate pair collapses
        (1L, 2L),
        (1L, 17L),            // name ends in 7 -> complained, anti-joined
        (2L, 1L), (3L, 1L))   // both parts filtered out
        .toDF("l_partkey", "l_suppkey"))
    val r = TpcHShapes.q16PartSupp(t)
      .select("p_brand", "p_type", "p_size", "supplier_cnt")
      .as[(String, String, Long, Long)].collect().toSeq
    assert(r == Seq(("Brand#2", "STANDARD", 5L, 2L)))
  }

  test("ivfKnnExact: separated clusters probe to their own bucket's members first") {
    // 64 vectors in two tight clusters far apart; nlist=2 with seed
    // vec_id % 2 mixes them, but ONE exact M-step + reassignment
    // separates them (each cluster's centroid lands nearer its own
    // members), so each query's top-k is drawn from its own cluster.
    val rng = new scala.util.Random(3)
    def jitter(base: Float) = Seq.fill(8)(base + rng.nextFloat() * 0.01f)
    val rows = (0L until 32L).map(i => (i, jitter(0.0f), 1)) ++
      (32L until 64L).map(i => (i, jitter(100.0f), 1))
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf9").toString
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val t = Tables(spark, dir)
    val r = Similarity.ivfKnnExact(t, k = 3, nlist = 2, nprobe = 1, nQueries = 2)
      .select("query_id", "rank", "neighbor_id", "d2")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(r.map(_._1).distinct == Seq(0L, 1L))
    assert(r.size == 6) // both queries fill k=3 from their own cluster
    r.foreach { case (_, _, n, d2) =>
      assert(n < 32L, "neighbor from the query's own cluster")
      assert(d2 >= 0L && d2 < 8L * 20000L * 20000L) // intra-cluster distance scale
    }
    // ranks are contiguous and distance-sorted per query
    r.groupBy(_._1).values.foreach { g =>
      assert(g.map(_._2) == Seq(1L, 2L, 3L))
      assert(g.map(_._4) == g.map(_._4).sorted)
    }
  }

  test("q20: availqty must beat half the 1996 demand, and demand must exist") {
    val t = star(
      "nation" -> Seq((5L, "NATION_5"), (0L, "NATION_0"))
        .toDF("n_nationkey", "n_name"),
      "supplier" -> Seq(
        (1L, "S1", 10.0, 5L), (2L, "S2", 20.0, 5L),
        (3L, "S3", 30.0, 5L), (5L, "S5", 50.0, 0L))
        .toDF("s_suppkey", "s_name", "s_acctbal", "s_nationkey"),
      "part" -> Seq((1L, "red widget"), (2L, "blue bolt"))
        .toDF("p_partkey", "p_name"),
      "lineitem" -> Seq(
        // (part, supp, qty, flag, shipdate)
        (1L, 1L, 10.0, "A", ts("1995-06-01")), // avail 10
        (1L, 1L, 4.0, "N", ts("1996-06-01")),  // ship96 4 -> 10 > 2: S1 in
        (1L, 2L, 1.0, "A", ts("1995-06-01")),  // avail 1
        (1L, 2L, 4.0, "N", ts("1996-06-01")),  // 1 < 2: S2 out
        (1L, 3L, 5.0, "A", ts("1995-06-01")),  // no 1996 demand: S3 out
        (2L, 3L, 9.0, "A", ts("1995-06-01")),  // wrong part name
        (2L, 3L, 1.0, "N", ts("1996-06-01")),
        (1L, 5L, 10.0, "A", ts("1995-06-01")), // qualifies but wrong nation
        (1L, 5L, 4.0, "N", ts("1996-06-01")))
        .toDF("l_partkey", "l_suppkey", "l_quantity", "l_returnflag", "l_shipdate"))
    val r = TpcHShapes.q20Potential(t, nation = "NATION_5", word = "red")
      .select("s_name", "s_acctbal").as[(String, Double)].collect().toSeq
    assert(r == Seq(("S1", 10.0)))
  }

  test("pipelineE2E: filter drops short/long docs, near-dups collapse, pack+split exact") {
    def words(n: Int, prefix: String = "w"): String =
      (1 to n).map(i => s"$prefix$i").mkString(" ")
    val docs = Seq(
      (1L, words(30)),                              // survives (cluster min id)
      (2L, words(29) + " CHANGED"),                 // near-dup of 1 -> dropped
      (3L, words(10)),                              // under 20 tokens -> filtered
      (4L, words(90)),                              // over 80 tokens -> filtered
      (5L, words(25, "unrelated")),                 // survives
      (6L, words(30)))                              // exact dup of 1 -> dropped
      .toDF("doc_id", "text")
    val t = star("documents" -> docs)
    val r = Curation.pipelineE2E(t, seqLen = 32L)
      .select("seq_id", "n_docs", "n_full_docs", "fill_tokens",
        "first_doc", "last_doc", "split")
      .as[(Long, Long, Long, Long, Long, Long, String)].collect().toSeq
    // survivors: doc 1 (30 tok) then doc 5 (25 tok); stream = 55 tokens
    // seq 0: doc1 whole (30) + first 2 of doc5 -> fill 32, 1 full doc
    // seq 1: tail of doc5 -> fill 23, 0 full docs
    def splitOf(seqId: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(seqId.toString.getBytes("UTF-8"))
      val h = java.lang.Long.parseLong(
        md.take(4).map(b => f"$b%02x").mkString, 16) % 1000000L
      if (h < 900000L) "train" else if (h < 950000L) "val" else "test"
    }
    assert(r == Seq(
      (0L, 2L, 1L, 32L, 1L, 5L, splitOf(0L)),
      (1L, 1L, 0L, 23L, 5L, 5L, splitOf(1L))))
  }

  test("round-9 plans: no nested-loop joins outside the sampled-audit contract") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    // lineDedup + pipelineE2E must stay equi-join-only: a nested loop
    // here means the segment/bucket key degraded to a residual filter
    for ((name, df) <- Seq(
        "lineDedup" -> Dedup.lineDedup(t),
        "pipelineE2E" -> Curation.pipelineE2E(t),
        "minhashIncremental" -> Dedup.minhashIncremental(t),
        "epochShuffle" -> Curation.epochShuffle(t))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"$name plans a non-equi join:\n$plan")
    }
    // geo make_valid is one codegen'd pass: no exchange except the
    // final ORDER BY sort
    val geo = graft.etl.Enrichment.geoAreaValid(t).queryExecution.executedPlan.toString
    assert(geo.sliding("Exchange".length).count(_ == "Exchange") <= 1,
      s"geoAreaValid should shuffle only for the output sort:\n$geo")
  }

  test("minhashIncremental: batch probes the index only — new-new and index-index pairs excluded") {
    def words(n: Int, prefix: String): String =
      (1 to n).map(i => s"$prefix$i").mkString(" ")
    val base = words(30, "w")
    val docs = Seq(
      (10L, base),                 // NEW (id % 10 == 0): dup of index doc 1
      (20L, base),                 // NEW: also dup of index doc 1 (but NOT paired with 10)
      (1L, base),                  // index
      (2L, base),                  // index dup of 1 -> must NOT appear (index-index)
      (3L, words(25, "z")))        // index, unrelated
      .toDF("doc_id", "text")
    val t = star("documents" -> docs)
    val got = Dedup.minhashIncremental(t)
      .select("new_doc", "dup_of").as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 1L), (10L, 2L), (20L, 1L), (20L, 2L)), s"got $got")
  }

  test("shardChecksum: signature is order-independent but catches edits, drops, and dups") {
    def sig(rows: Seq[(Long, String, Long)]): Map[Long, Long] = {
      val t = star("documents" -> rows.toDF("doc_id", "text", "n_chars"))
      Curation.shardChecksum(t).select("shard", "content_sig")
        .as[(Long, Long)].collect().toMap
    }
    val base = sig(Seq((0L, "alpha", 5L), (8L, "beta", 4L), (1L, "gamma", 5L)))
    // order of rows within the shard is irrelevant (XOR commutes)
    assert(sig(Seq((8L, "beta", 4L), (1L, "gamma", 5L), (0L, "alpha", 5L))) == base)
    // a one-character edit flips the shard-0 signature, leaves shard 1 alone
    val edited = sig(Seq((0L, "alphA", 5L), (8L, "beta", 4L), (1L, "gamma", 5L)))
    assert(edited(0L) != base(0L) && edited(1L) == base(1L))
    // a dropped row changes the signature
    assert(sig(Seq((0L, "alpha", 5L), (1L, "gamma", 5L)))(0L) != base(0L))
    // a PAIR of duplicated rows XORs itself out of the signature —
    // {a,a,b} folds to b, indistinguishable from {b} by sig alone —
    // which is why the manifest carries the row count too
    val t2 = star("documents" -> Seq((0L, "alpha", 5L), (0L, "alpha", 5L), (8L, "beta", 4L))
      .toDF("doc_id", "text", "n_chars"))
    val row = Curation.shardChecksum(t2).filter(col("shard") === 0L)
      .select("n_docs", "content_sig").as[(Long, Long)].head()
    assert(row._1 == 3L) // count catches what XOR cancels
    assert(row._2 == sig(Seq((8L, "beta", 4L)))(0L)) // the cancellation, demonstrated
  }

  test("lineDedup: segments recurring in >=minDf docs drop, tail segment counts short") {
    val boiler = (1 to 10).map(i => s"b$i").mkString(" ") // the shared banner
    def uniq(doc: Int, n: Int): String =
      (1 to n).map(i => s"u${doc}_$i").mkString(" ")
    val docs = Seq(
      (1L, s"$boiler ${uniq(1, 10)}"),       // banner + 1 unique segment
      (2L, s"$boiler ${uniq(2, 15)}"),       // banner + 1 full + 1 short(5)
      (3L, s"$boiler ${uniq(3, 10)}"),       // banner in 3 docs -> df=3 drops
      (4L, uniq(4, 12)))                     // no banner; 10 + short(2)
      .toDF("doc_id", "text")
    val t = star("documents" -> docs)
    val r = Dedup.lineDedup(t, segLen = 10, minDf = 3L)
      .select("doc_id", "n_segs", "n_boiler", "kept_tokens", "boiler_ppm")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq(
      (1L, 2L, 1L, 10L, 500000L),
      (2L, 3L, 1L, 15L, 333333L),
      (3L, 2L, 1L, 10L, 500000L),
      (4L, 2L, 0L, 12L, 0L)))
  }
}
