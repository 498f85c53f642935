package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
import org.apache.spark.sql.functions._

/** VERDICT r9 item 3: the deployment shape minhashIncremental's
  * scaladoc promises — persist the band-key index via TableWriter,
  * probe it from a fresh session, and get EXACTLY the pairs the
  * self-contained operator computes. */
class StoredIndexSpec extends SparkSpec {

  /** Scale assertion shared by both tests: both index tables are read
    * through their bucketed layout, and no Exchange sits BETWEEN an
    * index scan and its nearest ancestor join — the index side enters
    * its join in place, only the batch side shuffles. (Shuffles ABOVE
    * a join — the skinny candidate-pair repartition, the final
    * orderBy — are of derived frames and are fine.) AQE wraps
    * finalized subtrees in leaf QueryStageExecs, so the walk descends
    * into them explicitly. */
  private def assertIndexJoinsInPlace(probe: org.apache.spark.sql.DataFrame,
                                      prefix: String): Unit = {
    probe.count() // finalize the adaptive plan
    def isIndexScan(p: SparkPlan): Boolean = p match {
      case s: FileSourceScanExec =>
        s.relation.location.rootPaths.exists(_.toString.contains(s"${prefix}_"))
      case _ => false
    }
    // root-to-leaf ancestor chains ending at a stored-index scan
    def paths(p: SparkPlan, anc: List[SparkPlan]): Seq[List[SparkPlan]] = {
      val here = if (isIndexScan(p)) Seq(p :: anc) else Nil
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec        => Seq(q.plan)
        case r: ReusedExchangeExec    => Seq(r.child)
        case _                        => p.children
      }
      here ++ kids.flatMap(paths(_, p :: anc))
    }
    val chains = paths(probe.queryExecution.executedPlan, Nil)
    assert(chains.size == 2, "both index tables should be scanned")
    chains.foreach { case (scan: FileSourceScanExec) :: ancestors =>
      assert(scan.bucketedScan,
        s"index table must be read through its bucketed layout: $scan")
      val belowJoin = ancestors.takeWhile {
        case _: org.apache.spark.sql.execution.joins.BaseJoinExec => false
        case _                                                    => true
      }
      val shuffles = belowJoin.collect { case e: ShuffleExchangeLike => e }
      assert(shuffles.isEmpty,
        s"stored-index scan re-shuffled before its join: $shuffles")
    }
  }

  /** Fresh session for the probe: same catalog (the tables outlive
    * the writer's session), nothing recomputed corpus-side. Broadcast
    * joins off in THAT session only: at sf0.001 the index side fits a
    * broadcast, which hides the plan shape under test — at 100 TB the
    * index is corpus-sized and the join is sort-merge, where the
    * bucketed layout is what removes the index-side shuffle. */
  private def probeSession() = {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("stored index probed from a fresh session matches q_dedup_incremental exactly") {
    val t = tables
    // the corpus/batch split q_dedup_incremental pins: every 10th doc is "new"
    DedupIndex.writeIndex(t.documents.filter(col("doc_id") % 10 =!= 0), "sidx")
    graft.CacheRegistry.drain()

    val s2 = probeSession()
    val batch = graft.sources.Tables(s2, sfDir).documents
      .filter(col("doc_id") % 10 === 0)
    val stored = DedupIndex.probe(s2, batch, "sidx")

    val expected = rows(Dedup.minhashIncremental(t))
    assert(expected.nonEmpty, "parity check is vacuous without pairs")
    assert(rows(stored) == expected)
    assertIndexJoinsInPlace(stored, "sidx")
    graft.CacheRegistry.drain()
  }

  test("day-2 append merges into the index; day-3 probe matches the merged corpus exactly") {
    val t = tables
    // Deployment timeline (the 2024-run-on-2023-warehouse shape):
    // day 1 builds the index from docs with id%10 ∉ {0,5}, day 2
    // appends the id%10==5 batch, day 3 probes the id%10==0 batch.
    // Day1 ∪ day2 is EXACTLY q_dedup_incremental's corpus (id%10≠0),
    // so the day-3 probe against the merged index must reproduce the
    // self-contained operator byte-exact — including pairs that only
    // exist because of day-2 documents.
    val d10 = col("doc_id") % 10
    DedupIndex.writeIndex(t.documents.filter(d10 =!= 0 && d10 =!= 5), "sidx2")
    DedupIndex.appendIndex(t.documents.filter(d10 === 5), "sidx2")
    graft.CacheRegistry.drain()

    val s2 = probeSession()
    val batch = graft.sources.Tables(s2, sfDir).documents
      .filter(col("doc_id") % 10 === 0)
    val stored = DedupIndex.probe(s2, batch, "sidx2")

    val expected = rows(Dedup.minhashIncremental(t))
    assert(expected.nonEmpty, "parity check is vacuous without pairs")
    // the appended half must actually contribute pairs, or the merge
    // assertion is vacuous
    val day2Docs = t.documents.filter(d10 === 5)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(expected.exists(p => day2Docs(p._2)),
      "no expected pair involves a day-2 doc — split the corpus differently")
    assert(rows(stored) == expected)
    // appends add files per bucket; the scan must STAY bucketed with
    // the index side still entering its joins without an Exchange
    assertIndexJoinsInPlace(stored, "sidx2")
    graft.CacheRegistry.drain()

    // day 4: maintenance. The two writes left ≥2 files per non-empty
    // bucket; compactIndex's bucketed rewrite must restore one file
    // per bucket WITHOUT changing probe results or the in-place plan.
    def bucketFileNames(table: String): Seq[String] = {
      val loc = new java.io.File(new java.net.URI(
        spark.sql(s"DESCRIBE TABLE EXTENDED $table")
          .filter(col("col_name") === "Location")
          .head.getString(1)))
      loc.listFiles((_, n) => n.endsWith(".parquet")).map(_.getName).toSeq
    }
    def bucketFiles(table: String): Int = bucketFileNames(table).size
    assert(bucketFiles("sidx2_bands") > 8,
      "append should have left more than one file per bucket")
    DedupIndex.compactIndex(spark, "sidx2")
    graft.CacheRegistry.drain()
    assert(bucketFiles("sidx2_bands") <= 8 && bucketFiles("sidx2_shingles") <= 8,
      "compaction must restore at most one file per bucket:\n" +
        bucketFileNames("sidx2_bands").sorted.mkString("\n"))
    val s3 = probeSession()
    val compacted = DedupIndex.probe(s3,
      graft.sources.Tables(s3, sfDir).documents.filter(col("doc_id") % 10 === 0),
      "sidx2")
    assert(rows(compacted) == expected, "compaction changed probe results")
    assertIndexJoinsInPlace(compacted, "sidx2")
    graft.CacheRegistry.drain()
  }
}
