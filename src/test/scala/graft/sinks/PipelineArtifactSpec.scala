package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** VERDICT r10 item 7: the deliverable a 100 TB run ships — the e2e
  * pipeline materialized through TableWriter with per-shard checksums
  * and a split manifest, re-read and verified; and the verification
  * must actually have teeth (a tampered tree fails it). */
class PipelineArtifactSpec extends SparkSpec {

  test("pipeline artifact round-trips, self-verifies, and detects tampering") {
    val root = java.nio.file.Files.createTempDirectory("graft-artifact").toString
    PipelineArtifact.write(spark, tables, root)
    graft.CacheRegistry.drain()

    // tree shape: Hive-partitioned sequences + the two manifests
    val seqDir = new java.io.File(s"$root/sequences")
    assert(seqDir.listFiles().exists(_.getName.startsWith("split=")),
      "sequences must be Hive-partitioned by split")

    // intact artifact: every check row ok, and the checks are non-vacuous
    val v1 = PipelineArtifact.verify(spark, root).collect()
    assert(v1.nonEmpty, "verify produced no check rows")
    assert(v1.count(_.getString(0) == "shard_checksum") > 0)
    assert(v1.count(_.getString(0) == "split_totals") > 0)
    assert(v1.forall(_.getBoolean(2)),
      s"intact artifact failed verification: ${v1.filterNot(_.getBoolean(2)).mkString(", ")}")

    // manifest agrees with the pipeline frame itself (not just disk
    // self-consistency): total sequences across shards == frame count
    val frameSeqs = graft.operators.Curation.pipelineE2E(tables).count()
    graft.CacheRegistry.drain()
    val manifestSeqs = spark.read.parquet(s"$root/manifest/checksums")
      .agg(sum(col("n_seqs"))).collect().head.getLong(0)
    assert(manifestSeqs == frameSeqs,
      s"manifest counts $manifestSeqs sequences, pipeline frame has $frameSeqs")

    // tampering: drop one non-empty data file from a split directory —
    // a re-verify must fail (count and/or signature mismatch)
    val victim = seqDir.listFiles().filter(_.getName.startsWith("split="))
      .flatMap(_.listFiles((_, n) => n.endsWith(".parquet")))
      .maxBy(_.length())
    assert(victim.delete(), s"could not delete $victim")
    val v2 = PipelineArtifact.verify(spark, root).collect()
    assert(v2.exists(!_.getBoolean(2)),
      "verification passed on a tampered tree — the manifest has no teeth")
  }
}
