package graft.sources

import graft.SparkSpec
import graft.streaming.EventStreams
import org.apache.spark.sql.functions._

/** Source-format coverage: CSV and JSON round-trips with explicit
  * schemas, and the parquet FILE STREAMING source feeding the windowed
  * aggregation (the deployment shape: new files land, windows update). */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("csv round-trip with explicit schema and header") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    val ev = tables.events.select("event_id", "user_id", "event_type", "value")
    ev.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read
      .schema("event_id LONG, user_id LONG, event_type STRING, value DOUBLE")
      .option("header", "true").csv(dir)
    assert(back.count() == ev.count())
    assert(back.agg(sum("event_id")).head.getLong(0) ==
      ev.agg(sum("event_id")).head.getLong(0))
  }

  test("json-lines round-trip preserves types under explicit schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft-json").toString
    val docs = tables.documents
    docs.write.mode("overwrite").json(dir)
    val back = spark.read
      .schema("doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")
      .json(dir)
    assert(back.count() == docs.count())
    assert(back.filter(col("lang") === "en").count() ==
      docs.filter(col("lang") === "en").count())
  }

  test("file streaming source: windowed counts converge to the batch result") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-src").toString
    val ev = tables.events.select("ts", "event_type")
    ev.limit(300).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(ev.schema).parquet(dir)
    val q = EventStreams.windowedCounts(stream)
      .writeStream.format("memory").queryName("filesrc")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("filesrc").agg(sum("n")).head.getLong(0)
      assert(streamed == 300L)
    } finally q.stop()
  }

  test("streaming restart from checkpoint: new files only, exactly-once output") {
    val base = java.nio.file.Files.createTempDirectory("graft-chk").toString
    val (in, out, chk) = (s"$base/in", s"$base/out", s"$base/chk")
    def startQuery() =
      spark.readStream.schema("id LONG").parquet(in)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", chk)
        .outputMode("append").start()
    spark.range(0, 100).toDF("id").coalesce(1).write.mode("append").parquet(in)
    val q1 = startQuery()
    q1.processAllAvailable(); q1.stop()
    spark.range(100, 150).toDF("id").coalesce(1).write.mode("append").parquet(in)
    // restart: the checkpoint's file log must skip the already-ingested
    // batch — the output sees each input row EXACTLY once
    val q2 = startQuery()
    q2.processAllAvailable(); q2.stop()
    val res = spark.read.parquet(out)
    assert(res.count() == 150L, s"got ${res.count()}")
    assert(res.distinct().count() == 150L)
  }

  test("permissive JSON ingest: corrupt rows quarantined, good rows survive") {
    // at 100 TB a feed WILL contain garbage; the pipeline must load the
    // good rows and route the bad ones to a quarantine column, never
    // fail the job (FAILFAST) or silently drop (DROPMALFORMED)
    val dir = java.nio.file.Files.createTempDirectory("graft-corrupt")
    java.nio.file.Files.write(dir.resolve("feed.jsonl"), java.util.Arrays.asList(
      """{"id": 1, "v": 10.5}""",
      """{"id": 2, "v": """, // truncated mid-record
      """not json at all""",
      """{"id": 3, "v": 7.25}"""))
    val schema = "id LONG, v DOUBLE, _corrupt_record STRING"
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir.toString)
      .cache() // Spark requires materialization before filtering on the corrupt col
    val good = df.filter(col("_corrupt_record").isNull)
    val bad = df.filter(col("_corrupt_record").isNotNull)
    assert(good.count() == 2 && bad.count() == 2)
    assert(good.agg(sum("v")).head.getDouble(0) == 17.75)
    // quarantined rows keep their raw payload for replay/debugging
    assert(bad.select("_corrupt_record").collect()
      .forall(r => r.getString(0).nonEmpty))
    df.unpersist()
  }
}
