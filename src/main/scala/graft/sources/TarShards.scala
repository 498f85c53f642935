package graft.sources

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WebDataset-style TAR shards — the de-facto container for
  * large-scale multimodal training data (a corpus travels as .tar
  * files of `<key>.<ext>` entries; loaders stream entries
  * sequentially). Both directions in pure JVM byte logic — POSIX
  * ustar headers, 512-byte block padding, two-zero-block EOF — so the
  * shards are REAL tar streams (the spec shells out to the system
  * `tar` to prove interop), and both directions run INSIDE the plan:
  * shard assembly is a per-group kernel after one hash partition on
  * the shard id, parsing is a flatMap over opaque binary — no
  * driver-side I/O, which is what makes the format usable at 100 TB
  * (shards are just rows of a binary column; store them in parquet,
  * object storage, or a SnapshotStore table like any other payload).
  */
object TarShards {

  private val BLOCK = 512

  private def octal(v: Long, width: Int): Array[Byte] = {
    // POSIX numeric field: zero-padded octal + NUL. Fail fast on
    // overflow — a silently truncated size field corrupts the stream
    val s = v.toOctalString
    require(s.length <= width - 1, s"tar numeric field overflow: $v / $width")
    val pad = "0" * (width - 1 - s.length) + s
    (pad + "\u0000").getBytes("US-ASCII")
  }

  /** Split a long path into (prefix, base) per the ustar prefix rule:
    * the rightmost '/' where the remainder fits the 100-byte name
    * field and the head fits the 155-byte prefix field. The reader
    * rejoins them as `prefix + "/" + name`. */
  private def prefixSplit(name: String): (String, String) = {
    if (name.length <= 100) return ("", name)
    val candidates = name.indices.filter(name(_) == '/')
      .filter(i => name.length - i - 1 <= 100 && i <= 155)
    require(candidates.nonEmpty,
      s"tar entry name unsplittable across name+prefix fields: $name")
    val i = candidates.head
    (name.substring(0, i), name.substring(i + 1))
  }

  /** One raw ustar member: header block + content + zero padding.
    * `name`/`prefix` must already fit their fields (ASCII, ≤100/≤155
    * bytes — [[entry]] arranges that). */
  private def rawEntry(name: String, prefix: String, content: Array[Byte],
                       typeflag: Byte): Array[Byte] = {
    val h = new Array[Byte](BLOCK)
    def put(off: Int, bytes: Array[Byte]): Unit =
      System.arraycopy(bytes, 0, h, off, bytes.length)
    val nameBytes = name.getBytes("US-ASCII")
    require(nameBytes.length <= 100, s"tar name field overflow: $name")
    val prefixBytes = prefix.getBytes("US-ASCII")
    require(prefixBytes.length <= 155, s"tar prefix field overflow: $prefix")
    put(0, nameBytes)
    put(345, prefixBytes)
    put(100, octal(420, 8))            // mode 0644
    put(108, octal(0, 8))              // uid
    put(116, octal(0, 8))              // gid
    put(124, octal(content.length.toLong, 12))
    put(136, octal(0, 12))             // mtime: epoch, deterministic
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum field = spaces
    h(156) = typeflag
    put(257, "ustar\u0000".getBytes("US-ASCII"))
    put(263, "00".getBytes("US-ASCII"))
    val sum = h.map(_ & 0xff).sum
    put(148, (f"$sum%06o" + "\u0000 ").getBytes("US-ASCII"))
    val padded = (content.length + BLOCK - 1) / BLOCK * BLOCK
    val out = new Array[Byte](BLOCK + padded)
    System.arraycopy(h, 0, out, 0, BLOCK)
    System.arraycopy(content, 0, out, BLOCK, content.length)
    out
  }

  /** `<len> path=<name>\n` — the PAX extended-header record carrying
    * the exact UTF-8 path; the length prefix counts ITSELF (decimal
    * digits included), hence the fixpoint over its own digit count. */
  private def paxPathRecord(name: String): Array[Byte] = {
    val payload = s" path=$name\n".getBytes("UTF-8")
    var len = payload.length + 1
    while (len.toString.length + payload.length != len)
      len = len.toString.length + payload.length
    len.toString.getBytes("US-ASCII") ++ payload
  }

  /** One tar entry: a plain ustar member when the name is ASCII and
    * fits name(+prefix); otherwise a PAX 'x' extended header carrying
    * the exact UTF-8 path, followed by the member under an ASCII
    * placeholder name — what gnu/bsd tar emit, and what [[untar]]'s
    * PAX handling reads back. (Reference-domain note: Finnish entry
    * names carry ö/ä — crowdsorsa-etl-2023.R:88-94 repairs exactly
    * those bytes — so non-ASCII names are a day-one case, not an
    * edge; a US-ASCII encode would silently fold them to '?' and
    * collide distinct names.) */
  private def entry(name: String, content: Array[Byte]): Array[Byte] = {
    val ascii = name.forall(_ < 0x80)
    val splittable = name.length <= 100 ||
      name.indices.exists(i => name(i) == '/' &&
        name.length - i - 1 <= 100 && i <= 155)
    if (ascii && splittable) {
      val (prefix, base) = prefixSplit(name)
      rawEntry(base, prefix, content, '0')
    } else {
      // placeholder: ASCII-sanitized, field-bounded — readers without
      // PAX support still extract SOMETHING; PAX readers (ours, the
      // system tar) see the exact path from the 'x' header
      val placeholder = name.map(c => if (c < 0x80) c else '_')
        .takeRight(100)
      rawEntry("PaxHeaders/0", "", paxPathRecord(name), 'x') ++
        rawEntry(placeholder, "", content, '0')
    }
  }

  private val shardSchema = StructType(Seq(
    StructField("shard_id", LongType),
    StructField("n_entries", IntegerType),
    StructField("tar", BinaryType)))

  /** Pack generic (shard_id, name, content) entries into TAR shards:
    * one row per shard, entries sorted by name within the shard
    * (deterministic bytes). One shuffle (hash on the shard id); shard
    * assembly is a sort + concat inside the group kernel. */
  def tarEntryShards(entries: DataFrame): DataFrame = {
    val enc = Encoders.row(shardSchema)
    entries.select(col("shard_id"), col("name"), col("content"))
      .groupBy(col("shard_id"))
      .agg(sort_array(collect_list(struct(col("name"), col("content"))))
        .as("entries"))
      .mapPartitions { rows =>
        rows.map { r =>
          val shard = r.getLong(0)
          val es = r.getSeq[Row](1)
          val bos = new java.io.ByteArrayOutputStream()
          es.foreach { e =>
            bos.write(entry(e.getString(0), e.getAs[Array[Byte]](1)))
          }
          bos.write(new Array[Byte](2 * BLOCK)) // EOF: two zero blocks
          Row(shard, es.length, bos.toByteArray)
        }
      }(enc)
  }

  /** Pack documents into TAR shards: `docsPerShard` entries named
    * `<doc_id>.txt` per shard. */
  def tarShards(docs: DataFrame, docsPerShard: Int = 64): DataFrame =
    tarEntryShards(
      Dedup.spread(docs.select(col("doc_id"), col("text")))
        .select((col("doc_id") / docsPerShard).cast("long").as("shard_id"),
          concat(col("doc_id").cast("string"), lit(".txt")).as("name"),
          col("text").cast("binary").as("content")))

  private val entrySchema = StructType(Seq(
    StructField("shard_id", LongType),
    StructField("name", StringType),
    StructField("content", BinaryType)))

  /** Gzip the shard payloads (JDK Deflate) — the `.tar.gz` form
    * WebDataset shards actually ship in. [[untar]] auto-detects the
    * 1f 8b magic, so compressed and plain shards mix freely. */
  def gzipShards(shards: DataFrame): DataFrame = {
    val enc = Encoders.row(shardSchema)
    shards.select(col("shard_id"), col("n_entries"), col("tar"))
      .mapPartitions { rows =>
        rows.map { r =>
          val bos = new java.io.ByteArrayOutputStream()
          val gz = new java.util.zip.GZIPOutputStream(bos)
          gz.write(r.getAs[Array[Byte]](2)); gz.close()
          Row(r.getLong(0), r.getInt(1), bos.toByteArray)
        }
      }(enc)
  }

  /** NUL-terminated string field at [off, off+max). */
  private def strField(tar: Array[Byte], off: Int, max: Int): String = {
    var i = off; while (i < off + max && i < tar.length && tar(i) != 0) i += 1
    new String(tar, off, i - off, "UTF-8")
  }

  /** PAX extended-header payload: `<len> <key>=<value>\n` records.
    * Returns the `path` override if present (the key that renames the
    * FOLLOWING entry — the only PAX key a sample loader needs).
    * Record lengths count BYTES (the value is UTF-8), so the walk is
    * over the raw bytes — a char-indexed parse would overshoot on
    * every multibyte character and silently drop the record. */
  private def paxPath(content: Array[Byte]): Option[String] = {
    var off = 0
    var found: Option[String] = None
    while (off < content.length) {
      var sp = off
      while (sp < content.length && content(sp) != ' ') sp += 1
      if (sp >= content.length) return found
      val len =
        try new String(content, off, sp - off, "US-ASCII").trim.toInt
        catch { case _: NumberFormatException => return found }
      if (len <= 0 || off + len > content.length) return found
      val rec = new String(content, sp + 1, off + len - sp - 1, "UTF-8")
        .stripSuffix("\n")
      val eq = rec.indexOf('=')
      if (eq > 0 && rec.substring(0, eq) == "path")
        found = Some(rec.substring(eq + 1))
      off += len
    }
    found
  }

  /** Parse TAR shards back to entries — the WebDataset loader side:
    * walk 512-byte headers, read the octal size, slurp the content,
    * skip the padding, stop at the zero block. Foreign tars (written
    * by GNU/BSD tar, not just our packer) parse correctly: the
    * typeflag byte gates what counts as DATA (regular files only —
    * directories, links and device nodes are skipped, never surfaced
    * as samples), PAX extended headers ('x', per-entry `path`
    * override honored; 'g' skipped) and GNU long-name entries ('L')
    * rename the following entry instead of leaking metadata blocks as
    * content, and the ustar prefix field rejoins split long paths.
    * flatMap over opaque binary; gzipped shards (1f 8b magic) inflate
    * transparently; malformed trailing bytes end the shard
    * (stream-robust, never throws mid-scan). */
  def untar(shards: DataFrame): DataFrame = {
    val enc = Encoders.row(entrySchema)
    shards.select(col("shard_id"), col("tar"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val shard = r.getLong(0)
          val raw = r.getAs[Array[Byte]](1)
          val tar =
            if (raw.length >= 2 && (raw(0) & 0xff) == 0x1f &&
                (raw(1) & 0xff) == 0x8b)
              new java.util.zip.GZIPInputStream(
                new java.io.ByteArrayInputStream(raw)).readAllBytes()
            else raw
          val out = scala.collection.mutable.ArrayBuffer.empty[Row]
          var off = 0
          var done = false
          // metadata entries rename the NEXT entry; PAX wins over 'L'
          var longName: Option[String] = None
          var paxName: Option[String] = None
          while (!done && off + BLOCK <= tar.length) {
            if (tar(off) == 0) done = true // zero block: EOF
            else {
              val sizeStr = new String(tar, off + 124, 12, "US-ASCII")
                .takeWhile(c => c >= '0' && c <= '7')
              val size64 = java.lang.Long.parseLong(
                if (sizeStr.isEmpty) "0" else sizeStr, 8)
              require(size64 <= Int.MaxValue - BLOCK,
                s"tar entry too large for in-memory parse: $size64")
              val size = size64.toInt
              val body = off + BLOCK
              if (body + size > tar.length) done = true // truncated
              else {
                val typeflag = tar(off + 156)
                val isUstar = tar.length >= off + 262 &&
                  new String(tar, off + 257, 5, "US-ASCII") == "ustar"
                lazy val headerName = {
                  val base = strField(tar, off, 100)
                  val prefix = if (isUstar) strField(tar, off + 345, 155) else ""
                  if (prefix.isEmpty) base else prefix + "/" + base
                }
                lazy val content =
                  java.util.Arrays.copyOfRange(tar, body, body + size)
                typeflag match {
                  case '0' | 0 | '7' => // regular file ('7': contiguous)
                    val name = paxName.orElse(longName).getOrElse(headerName)
                    out += Row(shard, name, content)
                    longName = None; paxName = None
                  case 'L' => // GNU long name: content names the next entry
                    longName = Some(new String(content, "UTF-8")
                      .takeWhile(_ != 0))
                  case 'x' => // PAX per-entry header: path override
                    paxName = paxPath(content).orElse(paxName)
                  case 'g' => // PAX global header: no per-sample meaning
                  case _ => // dir/link/device/other metadata: not a sample
                    longName = None; paxName = None
                }
                off = body + (size + BLOCK - 1) / BLOCK * BLOCK
              }
            }
          }
          out
        }
      }(enc)
  }

  /** Oracled end-to-end round-trip: documents → tar shards → untar →
    * per-document identity stats. The oracle computes the same rows
    * straight from `documents` — equality proves the pack/parse pair
    * is the identity on real tar bytes. */
  def tarRoundtrip(t: Tables, docsPerShard: Int = 64): DataFrame =
    untar(tarShards(t.documents, docsPerShard))
      .select(
        expr("CAST(substr(name, 1, length(name) - 4) AS BIGINT)").as("doc_id"),
        col("shard_id"),
        octet_length(col("content")).cast("long").as("n_bytes"),
        md5(col("content")).as("fingerprint"))
      .orderBy(col("doc_id"))
}
