package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) ingest: round-trips, the standard per-record-gzip
  * layout, a foreign hand-written record stream per the public spec,
  * and system-gzip interop on the .warc.gz bytes. */
class WarcIngestSpec extends SparkSpec {
  import spark.implicits._

  private def pages(n: Int) =
    spark.range(n).select(
      (col("id") % 2).as("shard_id"),
      concat(lit("https://example.org/doc/"), col("id").cast("string"))
        .as("target_uri"),
      concat(lit("<html><body>page "), col("id").cast("string"),
        lit(" ä</body></html>")).cast("binary").as("body"))

  test("plain and per-record-gzip shards parse to identical records; bodies byte-exact") {
    def recs(gz: Boolean): Seq[(String, String, Int, String)] =
      WarcIngest.parseWarc(WarcIngest.warcShards(pages(6), perRecordGzip = gz))
        .select(col("warc_type"), col("target_uri"), col("http_status"),
          col("body").cast("string"))
        .collect().map(r => (r.getString(0),
          if (r.isNullAt(1)) null else r.getString(1),
          if (r.isNullAt(2)) -1 else r.getInt(2),
          if (r.isNullAt(3)) null else r.getString(3)))
        .sortBy(t => (t._1, Option(t._2).getOrElse(""))).toSeq
    val plain = recs(gz = false)
    val zipped = recs(gz = true)
    assert(plain == zipped)
    // 6 response records + 2 warcinfo (one per shard)
    assert(plain.count(_._1 == "response") == 6)
    assert(plain.count(_._1 == "warcinfo") == 2)
    val r0 = plain.find(_._2 == "https://example.org/doc/0").get
    assert(r0._3 == 200 && r0._4 == "<html><body>page 0 ä</body></html>")
  }

  test("foreign record stream hand-written per the public spec parses (request+response, case-insensitive fields)") {
    // field-name casing intentionally scrambled; a request record (a
    // type our writer never emits) must still parse
    val http = "HTTP/1.1 404 Not Found\r\ncontent-type: text/plain\r\n\r\nmissing!"
    val reqPayload = "GET /x HTTP/1.1\r\nHost: example.org\r\n\r\n"
    val warc =
      "WARC/1.0\r\n" +
        "warc-type: request\r\n" +
        "WARC-RECORD-ID: <urn:uuid:req-1>\r\n" +
        "Warc-Target-Uri: https://example.org/x\r\n" +
        "Content-Type: application/http; msgtype=request\r\n" +
        s"CONTENT-LENGTH: ${reqPayload.getBytes("UTF-8").length}\r\n" +
        "\r\n" + reqPayload + "\r\n\r\n" +
      "WARC/1.0\r\n" +
        "WARC-Type: response\r\n" +
        "WARC-Record-ID: <urn:uuid:resp-1>\r\n" +
        "WARC-Target-URI: https://example.org/x\r\n" +
        "Content-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: ${http.getBytes("UTF-8").length}\r\n" +
        "\r\n" + http + "\r\n\r\n"
    val df = spark.createDataFrame(
      java.util.List.of(Row(0L, warc.getBytes("UTF-8"))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("shard_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("warc",
          org.apache.spark.sql.types.BinaryType))))
    val got = WarcIngest.parseWarc(df)
      .select("warc_type", "record_id", "http_status", "body")
      .collect().sortBy(_.getString(0))
    assert(got.length == 2)
    val Array(req, resp) = got
    assert(req.getString(0) == "request" &&
      req.getString(1) == "<urn:uuid:req-1>")
    assert(new String(req.getAs[Array[Byte]](3), "UTF-8") == "")
    assert(resp.getString(0) == "response" && resp.getInt(2) == 404)
    assert(new String(resp.getAs[Array[Byte]](3), "UTF-8") == "missing!")
  }

  test("system gzip reads our .warc.gz members; the decompressed stream re-parses identically") {
    val shard = WarcIngest.warcShards(pages(4).filter(col("shard_id") === 0),
      perRecordGzip = true).collect().head.getAs[Array[Byte]]("warc")
    val dir = java.nio.file.Files.createTempDirectory("graft-warc")
    val gzf = dir.resolve("s.warc.gz")
    java.nio.file.Files.write(gzf, shard)
    // gzip -t validates every member's CRC; -d concatenates members
    import scala.sys.process._
    assert(Seq("gzip", "-t", gzf.toString).! == 0,
      "system gzip rejects our member stream")
    assert(Seq("gzip", "-d", "-k", gzf.toString).! == 0)
    val plain = java.nio.file.Files.readAllBytes(dir.resolve("s.warc"))
    assert(new String(plain, 0, 8, "US-ASCII") == "WARC/1.0")
    val reparsed = WarcIngest.parseWarc(spark.createDataFrame(
      java.util.List.of(Row(0L, plain)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("shard_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("warc",
          org.apache.spark.sql.types.BinaryType)))))
    assert(reparsed.filter(col("warc_type") === "response").count() == 2)
  }

  test("corrupt streams fail fast") {
    def parse(bytes: Array[Byte]) =
      WarcIngest.parseWarc(spark.createDataFrame(
        java.util.List.of(Row(0L, bytes)),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("shard_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("warc",
            org.apache.spark.sql.types.BinaryType)))))
        .collect()
    intercept[org.apache.spark.SparkException] {
      parse("HTTP/1.1 200 OK\r\n\r\nnot a warc\r\n\r\n".getBytes("UTF-8"))
    }
    intercept[org.apache.spark.SparkException] {
      parse(("WARC/1.0\r\nWARC-Type: response\r\n" +
        "Content-Length: 999999\r\n\r\nshort").getBytes("UTF-8"))
    }
  }
}
