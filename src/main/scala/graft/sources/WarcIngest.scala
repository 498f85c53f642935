package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC — the Web ARChive container (ISO 28500, the public spec behind
  * Common Crawl), the format a web-scale LLM corpus actually arrives
  * in. Both directions in pure JVM byte logic, INSIDE the plan (the
  * TarShards discipline): a record is a `WARC/1.0` version line +
  * named fields + blank line + `Content-Length` payload + a two-CRLF
  * separator; a `.warc.gz` is per-record gzip MEMBERS concatenated
  * (readers seek to member offsets; a streaming gunzip reads the
  * whole file — JDK GZIPInputStream handles multi-member streams).
  * Response records carry an `application/http; msgtype=response`
  * payload (status line + headers + body), parsed to typed columns.
  *
  * Scale: shards are rows of a binary column — the writer is one hash
  * shuffle on the shard id + a per-group kernel, the parser a flatMap
  * over opaque binary; no driver I/O anywhere, so a 100 TB crawl is
  * just a parquet/snapshot table of WARC payloads flatMapped into
  * records, with Spark sizing the parallelism by input splits. */
object WarcIngest {

  private val CRLF = "\r\n".getBytes("US-ASCII")

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** One WARC/1.0 record: version line, named fields (Content-Length
    * appended from the payload), CRLF CRLF, payload, CRLF CRLF. */
  def record(fields: Seq[(String, String)],
             payload: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("WARC/1.0\r\n".getBytes("US-ASCII"))
    (fields :+ ("Content-Length" -> payload.length.toString)).foreach {
      case (k, v) => bos.write(s"$k: $v\r\n".getBytes("UTF-8"))
    }
    bos.write(CRLF)
    bos.write(payload)
    bos.write(CRLF); bos.write(CRLF)
    bos.toByteArray
  }

  /** HTTP/1.1 response payload for `msgtype=response` records. */
  def httpResponse(status: Int, reason: String, contentType: String,
                   body: Array[Byte]): Array[Byte] =
    (s"HTTP/1.1 $status $reason\r\nContent-Type: $contentType\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes("US-ASCII") ++ body

  private def gz(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(bytes); g.close()
    bos.toByteArray
  }

  private val shardSchema = StructType(Seq(
    StructField("shard_id", LongType),
    StructField("n_records", IntegerType),
    StructField("warc", BinaryType)))

  /** Pack (shard_id, target_uri, body) page rows into WARC shards: one
    * row per shard — a leading `warcinfo` record (the spec's file
    * header convention) + one `response` record per page, sorted by
    * URI within the shard (deterministic bytes). `perRecordGzip` emits
    * the standard `.warc.gz` member-per-record layout. One shuffle
    * (hash on the shard id); assembly is a per-group kernel. */
  def warcShards(pages: DataFrame, perRecordGzip: Boolean = false)
      : DataFrame = {
    val enc = Encoders.row(shardSchema)
    pages.select(col("shard_id"), col("target_uri"), col("body"))
      .groupBy(col("shard_id"))
      .agg(sort_array(collect_list(struct(col("target_uri"), col("body"))))
        .as("pages"))
      .mapPartitions { rows =>
        rows.map { r =>
          val shard = r.getLong(0)
          val ps = r.getSeq[Row](1)
          val bos = new java.io.ByteArrayOutputStream()
          def emit(rec: Array[Byte]): Unit =
            bos.write(if (perRecordGzip) gz(rec) else rec)
          val date = "2024-01-01T00:00:00Z" // deterministic bytes
          emit(record(Seq(
            "WARC-Type" -> "warcinfo",
            "WARC-Record-ID" -> s"<urn:uuid:${md5hex(s"warcinfo-$shard")}>",
            "WARC-Date" -> date,
            "Content-Type" -> "application/warc-fields"),
            (s"software: graft-warc/1.0\r\n" +
              s"isPartOf: shard-$shard\r\n").getBytes("UTF-8")))
          ps.foreach { p =>
            val uri = p.getString(0)
            val body = p.getAs[Array[Byte]](1)
            emit(record(Seq(
              "WARC-Type" -> "response",
              "WARC-Record-ID" -> s"<urn:uuid:${md5hex(uri)}>",
              "WARC-Date" -> date,
              "WARC-Target-URI" -> uri,
              "Content-Type" -> "application/http; msgtype=response"),
              httpResponse(200, "OK", "text/html; charset=utf-8", body)))
          }
          Row(shard, ps.length, bos.toByteArray)
        }
      }(enc)
  }

  private val recordSchema = StructType(Seq(
    StructField("shard_id", LongType),
    StructField("warc_type", StringType),
    StructField("record_id", StringType),
    StructField("warc_date", StringType),
    StructField("target_uri", StringType),
    StructField("content_length", LongType),
    StructField("n_warc_headers", IntegerType),
    StructField("http_status", IntegerType),
    StructField("http_content_type", StringType),
    StructField("body", BinaryType)))

  /** Streaming gunzip of a (possibly multi-member) gzip stream — the
    * `.warc.gz` per-record-member case reads as one concatenation. */
  private def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val bos = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](65536)
    var n = in.read(buf)
    while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
    bos.toByteArray
  }

  /** Parse one shard's WARC bytes (plain or gzip, auto-detected) into
    * typed record rows. WARC field names are case-insensitive (the
    * spec); `application/http` payloads get their status line, headers
    * and body split out. Malformed streams fail fast — a corrupt crawl
    * shard must surface, not half-parse. */
  private def parseBytes(shard: Long, raw: Array[Byte]): Iterator[Row] = {
    val bytes =
      if (raw.length >= 2 && (raw(0) & 0xff) == 0x1f && (raw(1) & 0xff) == 0x8b)
        gunzipAll(raw)
      else raw
    val out = scala.collection.mutable.ArrayBuffer.empty[Row]
    var off = 0
    def line(): String = {
      var i = off
      while (i + 1 < bytes.length && !(bytes(i) == '\r' && bytes(i + 1) == '\n'))
        i += 1
      require(i + 1 < bytes.length, s"WARC: unterminated line at $off")
      val s = new String(bytes, off, i - off, "UTF-8")
      off = i + 2
      s
    }
    while (off < bytes.length) {
      // the inter-record separator (two CRLFs) — and any stray blank
      // lines — sit between records
      while (off + 1 < bytes.length &&
        bytes(off) == '\r' && bytes(off + 1) == '\n') off += 2
      if (off < bytes.length) {
        val version = line()
        require(version.startsWith("WARC/"),
          s"WARC: expected version line at record start, got '$version'")
        val hdrs = scala.collection.mutable.Map.empty[String, String]
        var l = line()
        while (l.nonEmpty) {
          val i = l.indexOf(':')
          require(i > 0, s"WARC: malformed header line '$l'")
          hdrs(l.substring(0, i).trim.toLowerCase) = l.substring(i + 1).trim
          l = line()
        }
        val clen = hdrs.getOrElse("content-length",
          sys.error("WARC: record without Content-Length")).toLong
        require(off + clen <= bytes.length,
          s"WARC: payload overruns the stream ($clen bytes at $off)")
        val payload = java.util.Arrays.copyOfRange(bytes, off,
          off + clen.toInt)
        off += clen.toInt
        val ctype = hdrs.getOrElse("content-type", "")
        var status: Integer = null
        var httpCt: String = null
        var body: Array[Byte] = null
        if (ctype.toLowerCase.startsWith("application/http")) {
          // status line + headers + CRLFCRLF + body
          var p = 0
          def pline(): String = {
            var i = p
            while (i + 1 < payload.length &&
              !(payload(i) == '\r' && payload(i + 1) == '\n')) i += 1
            val s = new String(payload, p, i - p, "UTF-8")
            p = math.min(i + 2, payload.length)
            s
          }
          val statusLine = pline()
          val parts = statusLine.split(" ", 3)
          if (parts.length >= 2 && parts(0).startsWith("HTTP/"))
            status = Integer.valueOf(parts(1).toInt)
          var hl = pline()
          while (hl.nonEmpty && p < payload.length) {
            val i = hl.indexOf(':')
            if (i > 0 && hl.substring(0, i).trim.equalsIgnoreCase("content-type"))
              httpCt = hl.substring(i + 1).trim
            hl = pline()
          }
          body = java.util.Arrays.copyOfRange(payload, p, payload.length)
        }
        out += Row(shard, hdrs.getOrElse("warc-type", null),
          hdrs.getOrElse("warc-record-id", null),
          hdrs.getOrElse("warc-date", null),
          hdrs.getOrElse("warc-target-uri", null),
          clen, hdrs.size, status, httpCt, body)
      }
    }
    out.iterator
  }

  /** Parse (shard_id, warc) shard rows into record rows — a flatMap
    * over opaque binary, shard-parallel. */
  def parseWarc(shards: DataFrame): DataFrame = {
    val enc = Encoders.row(recordSchema)
    shards.select(col("shard_id"), col("warc"))
      .flatMap(r => parseBytes(r.getLong(0), r.getAs[Array[Byte]](1)))(enc)
  }
}
