package graft.sinks

import graft.SparkSpec
import graft.operators.DedupIndex
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** End-to-end incremental ETL across the round-14 layers: a versioned
  * SnapshotStore table of raw documents feeds a checkpointed CDC
  * consumer; each consumed delta probes the STORED MinHash index,
  * near-dups of everything previously accepted are dropped, accepted
  * docs fold into the index AND commit to a curated output table.
  * Every piece is O(delta): the CDC read opens only changed files,
  * the probe only shuffles the batch's band keys, the output commit
  * appends. This is the composition a daily 100 TB ingest actually
  * runs; the spec drives three days of it. */
class IncrementalPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$name").toString + "/t"

  test("CDC consumer → stored-index dedup → curated commits, three days in") {
    val raw = fresh("raw")
    val curated = fresh("curated")
    val doc1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val doc2 = "red orange yellow green blue indigo violet ultraviolet infrared xray"
    val doc3 = "gold silver bronze copper iron nickel zinc tin lead mercury"

    // one consumption-processing cycle (the daily job)
    def runDay(): Seq[Long] = {
      val (delta, v) = SnapshotStore.consumeChanges(spark, raw, "curator")
      val accepted = delta match {
        case None => Nil
        case Some(d) =>
          val docs = d.filter(col("_change") =!= "delete")
            .select(col("doc_id"), col("text"))
          val dups = DedupIndex.probe(spark, docs, "ipidx")
            .select(col("new_doc").as("doc_id")).distinct()
          val keep = docs.join(dups, Seq("doc_id"), "left_anti")
            .localCheckpoint() // freeze against the index append below
          DedupIndex.appendIndex(keep, "ipidx")
          SnapshotStore.commit(keep, curated, SaveMode.Append)
          keep.select("doc_id").as[Long].collect().toSeq.sorted
      }
      SnapshotStore.ackChanges(raw, "curator", v)
      graft.CacheRegistry.drain()
      accepted
    }

    // day 0: seed corpus committed + indexed + bootstrap-consumed
    SnapshotStore.commit(Seq((1L, doc1)).toDF("doc_id", "text"), raw)
    DedupIndex.writeIndex(spark.emptyDataset[(Long, String)]
      .toDF("doc_id", "text"), "ipidx")
    graft.CacheRegistry.drain()
    assert(runDay() == Seq(1L)) // bootstrap: whole table as inserts

    // day 1: one near-dup of the indexed doc, one fresh — only the
    // fresh doc reaches the curated table
    SnapshotStore.commit(
      Seq((10L, doc1), (11L, doc2)).toDF("doc_id", "text"),
      raw, SaveMode.Append)
    assert(runDay() == Seq(11L))

    // day 2: a copy of day-1's ACCEPTED doc (dropped only if day 1's
    // append reached the index) + a fresh doc
    SnapshotStore.commit(
      Seq((20L, doc2), (21L, doc3)).toDF("doc_id", "text"),
      raw, SaveMode.Append)
    assert(runDay() == Seq(21L))

    // nothing new ⇒ the consumer is a no-op
    assert(runDay().isEmpty)

    // the curated table holds exactly the accepted lineage, versioned
    assert(SnapshotStore.read(spark, curated).select("doc_id")
      .as[Long].collect().sorted.toSeq == Seq(1L, 11L, 21L))
    assert(SnapshotStore.latestVersion(curated) == 3)
    // and its own changelog replays the day-2 acceptance exactly
    assert(SnapshotStore.readChanges(spark, curated, 2, 3)
      .select("doc_id", "_change").as[(Long, String)].collect().toSeq ==
      Seq((21L, "insert")))
  }
}
