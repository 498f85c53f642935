package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Round15Spec extends SparkSpec {

  test("twoLevelAssign: every vector lands in exactly one (sup, child) cell; cells partition the corpus") {
    val (assigned, cells, supers) =
      Similarity.twoLevelAssign(tables.embeddings, nlist = 16, iters = 1)
    val n = tables.embeddings.count()
    assert(assigned.count() == n) // total function: no vector dropped or doubled
    assert(assigned.select("neighbor_id").distinct().count() == n)
    val nsup = supers.count()
    assert(nsup == 4) // ceil(sqrt(16))
    // every occupied cell's super exists in the super table
    val cellSups = cells.select("sup").distinct().collect().map(_.getInt(0)).toSet
    val supIds = supers.collect().map(_.getInt(0)).toSet
    assert(cellSups.subsetOf(supIds))
    // assignment is consistent with the cell table (no orphan cells)
    val orphan = assigned.join(cells, Seq("sup", "child"), "left_anti").count()
    assert(orphan == 0)
  }

  test("ivfKnnTwoLevel: recall vs brute-force truth, ranks well-formed") {
    val k = 5
    val truth = Similarity.knnCosine(tables, k).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val got = Similarity.knnIvf2l(tables, k).collect()
    assert(got.nonEmpty)
    // per query: ranks are 1..m without gaps, neighbors distinct
    got.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val ranks = rs.map(_.getLong(1)).sorted
      assert(ranks.toSeq == (1L to ranks.length).toSeq)
      assert(rs.map(_.getLong(2)).distinct.length == rs.length)
    }
    val pairs = got.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = pairs.intersect(truth).size.toDouble / truth.size
    info(s"ivfKnnTwoLevel recall@$k vs brute force: $recall")
    assert(recall >= 0.5, s"two-level recall collapsed: $recall")
  }

  test("webdatasetGzFromDisk: gzip → disk → binaryFile → inflate → regroup is the identity on text") {
    import spark.implicits._
    val got = Multimodal.webdatasetGzFromDisk(tables).collect()
    val docs = tables.documents
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toMap
    assert(got.length == docs.size)
    got.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == id / 64, "file-name shard id")
      assert(r.getLong(2) == 3L, "all three modalities survive")
      assert(r.getLong(3) == docs(id).getBytes("UTF-8").length.toLong)
    }
  }

  test("bitextMineIvf on the two-level index: recall vs dense held") {
    val dense = Similarity.bitextMine(tables)
      .select("src_id", "tgt_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.bitextMineIvf(tables)
      .select("src_id", "tgt_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.nonEmpty)
    val recall =
      if (dense.isEmpty) 1.0 else ivf.intersect(dense).size.toDouble / dense.size
    info(s"two-level bitext recall vs dense: $recall (${ivf.size} mined, ${dense.size} dense)")
    assert(recall >= 0.3, s"recall collapsed: $recall")
  }

  test("bitextMineIvf forced onto the two-level branch (nlist > 256) still mines a sane matching") {
    val dense = Similarity.bitextMine(tables)
      .select("src_id", "tgt_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // nlist=300 exceeds the flat-coarse threshold, so this exercises
    // the twoLevelAssign/twoLevelProbe candidate path end-to-end
    val rows = Similarity.bitextMineIvf(tables, nlist = 300)
      .select("src_id", "tgt_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).distinct.length == rows.length) // partial matching
    assert(rows.map(_._2).distinct.length == rows.length)
    val recall =
      if (dense.isEmpty) 1.0 else rows.toSet.intersect(dense).size.toDouble / dense.size
    info(s"two-level-branch bitext recall vs dense: $recall")
    assert(recall >= 0.2, s"two-level branch recall collapsed: $recall")
  }

  test("logregTrain: integer GD beats the majority class; score report consistent with confusion") {
    val r = QualityModel.logregTrain(tables).collect()
    assert(r.length == 1)
    val Seq(nDocs, tp, fp, tn, fn) = (0 to 4).map(r.head.getLong)
    assert(tp + fp + tn + fn == nDocs && nDocs > 0)
    val pos = tp + fn; val neg = fp + tn
    val majority = math.max(pos, neg).toDouble / nDocs
    val acc = (tp + tn).toDouble / nDocs
    info(f"train agreement $acc%.3f vs majority baseline $majority%.3f")
    assert(acc > majority, s"GD did not beat predict-majority: $acc <= $majority")

    // per-lang score report ties out against the global confusion
    val score = QualityModel.logregScore(tables).collect()
    assert(score.map(_.getString(0)).toSeq == score.map(_.getString(0)).sorted.toSeq)
    assert(score.map(_.getLong(1)).sum == nDocs)
    assert(score.map(_.getLong(2)).sum == tp + fp) // model keeps
    assert(score.map(_.getLong(3)).sum == tp + fn) // rule keeps

    // the fit is exactly deterministic: weights replay bit-for-bit
    val r2 = QualityModel.logregTrain(tables).collect().head
    (5 to 9).foreach(j => assert(r2.getLong(j) == r.head.getLong(j)))
  }

  test("compressionRatio: boilerplate << prose << high-entropy, bands assigned, deterministic") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "spam ham " * 400),                         // boilerplate
      (2L, "en", "the quick brown fox jumps over a lazy dog while " +
        "seventeen sleepy badgers argue about parquet row groups " +
        "and a distant churn of compaction threads hums beneath the " +
        "warehouse floor because every corpus eventually learns that " +
        "deduplication is a lifestyle rather than a feature flag and " +
        "the curious reader may wonder why anyone would compress text " +
        "merely to measure how much it resists being compressed"),
      (3L, "en", (0 until 200).map(i =>                      // high entropy
        java.util.Base64.getEncoder.encodeToString(
          java.security.MessageDigest.getInstance("MD5")
            .digest(s"seed$i".getBytes))).mkString(" ")),
      (4L, "en", ""),                                        // empty guard
      (5L, "en", "x")
    ).toDF("doc_id", "lang", "text")
    val r = TextAnalysis.compressionRatioOf(docs).collect()
      .map(x => x.getLong(0) -> (x.getLong(3), x.getLong(4),
        x.getString(5))).toMap
    val (boiler, prose, entropy) = (r(1L)._2, r(2L)._2, r(3L)._2)
    info(s"ratios ppm: boilerplate=$boiler prose=$prose entropy=$entropy")
    assert(boiler < prose && prose < entropy)
    assert(r(1L)._3 == "boilerplate" && r(2L)._3 == "ok" &&
      r(3L)._3 == "high_entropy")
    assert(r(4L)._1 >= 0 && r(5L)._1 > 0) // degenerate docs don't crash
    // zlib determinism: identical output across independent plans
    val again = TextAnalysis.compressionRatioOf(docs).collect()
      .map(x => x.getLong(0) -> x.getLong(3)).toMap
    assert(r.keySet.forall(k => again(k) == r(k)._1))
  }
}
