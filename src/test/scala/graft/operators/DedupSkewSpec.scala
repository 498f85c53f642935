package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Skewed-corpus evidence for the MinHash band join (VERDICT r9 item 5).
  *
  * On a boilerplate-heavy corpus the band-key self-join is SKEWED: every
  * copy of a duplicated document lands in the same (band, key) bucket,
  * so one shuffle partition holds a quadratic hot spot while the rest
  * hold singleton buckets. Two defenses, both proven here:
  *
  *  1. AQE skew split — the hot partition is split across tasks at
  *     runtime (`SortMergeJoinExec.isSkewJoin` in the finalized
  *     adaptive plan), which keeps the join parallel without any
  *     salting plumbing;
  *  2. the giant-bucket cap (`minhashPairs(maxBucket = …)`) — beyond
  *     what a split can fix (B²/2 output rows), oversized buckets are
  *     excluded from pairwise generation entirely.
  */
class DedupSkewSpec extends SparkSpec {

  /** `dupShare` of the docs are copies of one boilerplate string (the
    * hot band buckets); the rest are unique. doc_ids are xxhash64-scattered so
    * shuffle-partition byte sizes reflect genuine row counts rather
    * than delta-compressible sequential ids. */
  private def skewedCorpus(n: Long, dupShare: Double) = {
    val dups = (n * dupShare).toLong
    val boiler = "subscribe to our newsletter for updates terms of " +
      "service apply all rights reserved contact us for more information"
    spark.range(n).select(
      xxhash64(col("id")).as("doc_id"),
      when(col("id") < dups, lit(boiler))
        .otherwise(concat_ws(" ",
          (0 until 12).map(i =>
            concat(lit("w"), ((col("id") * 131 + i * 7919) % 999983L)
              .cast("string"))): _*)).as("text"))
  }

  test("band-key self-join AQE-skew-splits on a 90%-duplicated corpus") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.forceOptimizeSkewedJoin",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.shuffle.partitions")
      .map(k => k -> conf.get(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // 64 reduce partitions so the hot bucket dominates one partition
      // instead of drowning in a wide partition's singleton-bucket bulk.
      conf.set("spark.sql.shuffle.partitions", "64")
      // DETERMINISM over realism in the thresholds. AQE decides skew on
      // COMPRESSED map-output bytes, and the hot bucket's rows all carry
      // the identical band-key string — lz4 collapses them ~20×, so a
      // hot partition with 3.4× the median ROW count can sit under a
      // byte threshold tuned for incompressible data (the round-10
      // flake). Make the skew categorical instead: 90% dup share puts
      // the hot bucket at ~25× the median partition's row count, which
      // stays an order of magnitude over a 2KB threshold at ANY
      // plausible compression ratio.
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      // a skew split here cannot add a downstream shuffle (the join
      // feeds a global agg), but force=true removes AQE's cost-model
      // veto from the equation entirely — this test pins the SPLIT
      // mechanics, not the cost model.
      conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      // THE round-10 flake mechanism: AQE can only split a skewed
      // reduce partition at MAP-OUTPUT granularity, and on a corpus
      // this small coalescing shrinks the upstream stage to ~1 mapper
      // — one map chunk per reduce partition means there is nothing to
      // split, regardless of thresholds. Disabling coalescing keeps 64
      // mappers feeding the band shuffle (the cluster-realistic shape,
      // where map stages are wide) so the hot partition is splittable.
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val docs = skewedCorpus(2000L, 0.9)
      val dups = 1800L
      // the exact candidate-stage shape minhashPairs runs: signatures →
      // band keys → self-equi-join on bk (count instead of distinct so
      // the quadratic hot-bucket output collapses map-side)
      val banded = Dedup.minhashSignatures(Dedup.shingled(docs, 3), 32)
        .select(col("doc_id"), explode(Dedup.bandKeys(col("sig"), 8, 4)).as("bk"))
      val j = banded.select(col("doc_id").as("doc_a"), col("bk"))
        .join(banded.select(col("doc_id").as("doc_b"), col("bk")), Seq("bk"))
        .filter(col("doc_a") < col("doc_b"))
        .agg(count(lit(1)).as("n_pairs"))
      val nPairs = j.collect().head.getLong(0)
      // every dup-dup pair collides in all 8 bands
      assert(nPairs >= 8L * dups * (dups - 1) / 2,
        s"expected >= ${8L * dups * (dups - 1) / 2} raw candidate rows, got $nPairs")
      // Assert on the join operator's own skew flag via the finalized
      // adaptive plan tree — not on plan-STRING formatting, which is
      // version- and codec-coupled (ADVICE r10). QueryStageExec nodes
      // are LEAVES whose materialized plan hangs off `.plan`, not
      // `.children`, so a plain collect() never enters a stage — walk
      // through them explicitly.
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def allNodes(p: SparkPlan): Seq[SparkPlan] = {
        val inner = p match {
          case q: QueryStageExec        => Seq(q.plan)
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case _                        => Seq.empty
        }
        p +: (p.children ++ inner).flatMap(allNodes)
      }
      val skewJoins = allNodes(j.queryExecution.executedPlan).collect {
        case s: org.apache.spark.sql.execution.joins.SortMergeJoinExec
          if s.isSkewJoin => s
      }
      assert(skewJoins.nonEmpty,
        s"expected a skew-split SortMergeJoin on the band join in:\n" +
          j.queryExecution.executedPlan.toString.take(3000))
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
  }

  test("giant-bucket cap drops boilerplate pairs, keeps small clusters") {
    // 60 copies of boilerplate + 140 unique docs (nothing else near-dup)
    val docs = skewedCorpus(200L, 0.3)
    val capped = Dedup.minhashPairs(docs, maxBucket = 10)
    val uncapped = Dedup.minhashPairs(docs)
    val cappedN = capped.count()
    val uncappedN = uncapped.count()
    // uncapped: the 60-doc boilerplate cluster alone yields 60*59/2 pairs
    assert(uncappedN >= 60L * 59 / 2, s"uncapped should include the hot cluster, got $uncappedN")
    // capped: the oversized bucket is excluded entirely; nothing else
    // in this corpus is near-duplicate, so the capped result is empty —
    // and crucially it FINISHED without generating the quadratic pairs
    assert(cappedN == 0, s"capped should exclude the 60-doc bucket, got $cappedN")
    graft.CacheRegistry.drain()
  }

  test("cap keeps sub-cap clusters intact (only oversized buckets drop)") {
    // two disjoint clusters: one of 30 copies (over cap), one of 4 (under)
    val boiler = "one two three four five six seven eight nine ten eleven twelve"
    val small = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    import spark.implicits._
    val docs = ((1L to 30L).map(i => (i, boiler)) ++
      (31L to 34L).map(i => (i, small)) ++
      (35L to 60L).map(i => (i, s"unique doc $i with its own words " +
        s"nothing shared here ${i * 7} ${i * 13} ${i * 17} ${i * 19}")))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(docs, maxBucket = 10)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // the 4-doc cluster survives in full …
    val expectSmall = (for (a <- 31L to 34L; b <- (a + 1) to 34L) yield (a, b)).toSet
    assert(pairs == expectSmall,
      s"expected exactly the 4-doc cluster's pairs, got $pairs")
    graft.CacheRegistry.drain()
  }
}
