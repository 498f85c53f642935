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
}
