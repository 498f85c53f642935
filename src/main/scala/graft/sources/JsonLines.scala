package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** JSONL (newline-delimited JSON) ingest — the interchange format LLM
  * data pipelines actually trade in. The registered query is a
  * ROUND-TRIP FIDELITY HARNESS: write the documents table as JSONL,
  * inject a malformed line, read it back with an explicit schema in
  * PERMISSIVE mode (corrupt rows land in `_corrupt_record` instead of
  * failing the job — the posture a 100 TB ingest needs, where a
  * per-mille bad-line rate is a certainty, not a possibility), and prove
  * the decoded aggregate matches the parquet source exactly while the
  * corrupt line is counted, not silently dropped.
  *
  * Scale: read and write are both plain distributed scans (no
  * coalesce — the harness writes however many parts the input has);
  * the only shuffle is the one-row aggregate.
  *
  * The staging path defaults to a FIXED directory under the JVM's
  * temp root, overwritten on every invocation — repeated bench/verify
  * runs reuse the same disk footprint instead of accumulating one
  * JSONL copy of the corpus per call. The default is driver-local, so
  * it is only correct on a single-node (local[k]) deployment where
  * driver and executors share a filesystem — a cluster caller MUST
  * pass `stageDir` on shared storage (HDFS/object store), exactly as
  * it would for any other intermediate dataset.
  */
object JsonLines {

  def roundtrip(t: Tables, stageDir: Option[String] = None): DataFrame = {
    val spark = t.documents.sparkSession
    val dir = stageDir.getOrElse(java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft-jsonl-roundtrip").toString)
    t.documents.select("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").json(dir)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-corrupt.json"),
      "{\"doc_id\": this is not json\n".getBytes("UTF-8"))
    val schema = "doc_id BIGINT, text STRING, lang STRING, source STRING, " +
      "n_chars BIGINT, _corrupt_record STRING"
    val back = spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir)
    back.agg(
      count(when(col("_corrupt_record").isNull, 1)).as("n_docs"),
      countDistinct(when(col("_corrupt_record").isNull, col("lang"))).as("n_langs"),
      sum(when(col("_corrupt_record").isNull, col("n_chars"))).cast("long").as("total_chars"),
      count(when(col("_corrupt_record").isNotNull, 1)).as("n_corrupt"))
  }
}
