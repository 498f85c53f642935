package graft.sinks

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** MATERIALIZED artifact of the end-to-end curation pipeline — the
  * output tree a 100 TB run actually ships, not just the lazy frame:
  *
  *   <root>/sequences/split=train|val|test/…parquet  packed sequences
  *     (q_pipeline_e2e's result, Hive-partitioned by split so a
  *     trainer's `split = 'train'` filter prunes whole directories)
  *   <root>/manifest/checksums/…parquet  per-shard integrity manifest
  *     (q_shard_checksum's shape: row count + order-independent
  *     XOR-of-md5 content signature + token total per seq_id shard)
  *   <root>/manifest/splits/…parquet     per-split totals
  *     (q_split_assign's shape: sequences / tokens / doc slices)
  *
  * Shipping data without its manifest is how silent corruption ships.
  * Both manifests here are computed from what was actually RE-READ
  * from the written tree — they describe the bytes on disk, not the
  * writer's intent — and [[verify]] recomputes them from a fresh read
  * and compares value-exactly, so any dropped, duplicated, or
  * bit-rotted row surfaces as a named mismatch. All signatures are
  * md5-derived integer arithmetic (engine-reproducible: an auditor
  * can re-derive them in DuckDB from the same files).
  *
  * Scale: the sequences write is the pipeline's own (sub-linear)
  * plan + one partitioned write; each manifest is one map-side-
  * combined aggregate over the re-read tree with shard-count (resp.
  * 3) output rows; verify is two such aggregates + two skinny joins.
  */
object PipelineArtifact {

  private val seqCols = Seq("seq_id", "n_docs", "n_full_docs",
    "fill_tokens", "first_doc", "last_doc", "split")

  /** Order-independent 60-bit row signature (shardChecksum's fold,
    * over the full sequence row including its split assignment). */
  private def rowSig =
    conv(substring(md5(concat_ws("|", seqCols.map(c =>
      col(c).cast("string")): _*)), 1, 15), 16, 10).cast("long")

  private def shardManifest(seqs: DataFrame, shards: Int): DataFrame =
    seqs.groupBy((col("seq_id") % shards).as("shard"))
      .agg(count(lit(1)).as("n_seqs"),
        bit_xor(rowSig).as("content_sig"),
        sum(col("fill_tokens")).cast("long").as("total_tokens"))

  private def splitManifest(seqs: DataFrame): DataFrame =
    seqs.groupBy(col("split"))
      .agg(count(lit(1)).as("n_seqs"),
        sum(col("fill_tokens")).cast("long").as("total_tokens"),
        sum(col("n_docs")).cast("long").as("n_doc_slices"))

  /** Run the pipeline and materialize the artifact tree. */
  def write(spark: SparkSession, t: Tables, root: String,
            shards: Int = 8): Unit = {
    val seqs = graft.operators.Curation.pipelineE2E(t)
    TableWriter.writePartitioned(seqs, s"$root/sequences", "split")
    // manifests from the RE-READ tree: they attest the shipped bytes
    val onDisk = spark.read.parquet(s"$root/sequences")
    shardManifest(onDisk, shards).coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$root/manifest/checksums")
    splitManifest(onDisk).coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$root/manifest/splits")
  }

  /** Full-outer value compare of a stored vs freshly-recomputed
    * manifest: one row per key with ok = all columns equal (a key
    * present on only one side is a failure on that key). */
  private def compare(kind: String, keyCol: String,
                      stored: DataFrame, fresh: DataFrame): DataFrame = {
    val vals = stored.columns.filterNot(_ == keyCol).sorted
    def packed(df: DataFrame) = df.select(
      col(keyCol).cast("string").as("key"),
      struct(vals.map(col): _*).as("vals"))
    packed(stored).withColumnRenamed("vals", "stored")
      .join(packed(fresh).withColumnRenamed("vals", "fresh"), Seq("key"), "full_outer")
      .select(lit(kind).as("check"), col("key"),
        (col("stored").isNotNull && col("fresh").isNotNull &&
          col("stored") === col("fresh")).as("ok"))
  }

  /** Re-read the artifact tree and check it against its own shipped
    * manifests. Returns (check, key, ok) rows; every `ok` must be
    * true for an intact artifact. */
  def verify(spark: SparkSession, root: String, shards: Int = 8): DataFrame = {
    val onDisk = spark.read.parquet(s"$root/sequences")
    compare("shard_checksum", "shard",
        spark.read.parquet(s"$root/manifest/checksums"),
        shardManifest(onDisk, shards))
      .unionAll(compare("split_totals", "split",
        spark.read.parquet(s"$root/manifest/splits"),
        splitManifest(onDisk)))
      .orderBy(col("check"), col("key"))
  }
}
