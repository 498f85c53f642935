package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Archive ingest — the reference's first step is `unzip` + read
  * (crowdsorsa-etl-2023.R:28-32). Spark-native: `binaryFile` source
  * scans archives distributed (one task per file, no driver I/O), and
  * each archive is expanded to entry rows inside its task.
  */
object BinaryIngest {

  /** Raw file scan: (path, modificationTime, length, content). */
  def binaryFiles(spark: SparkSession, glob: String): DataFrame =
    spark.read.format("binaryFile").load(glob)

  /** Expand each zip archive into (archive, entry, bytes) rows. Runs
    * per-task on the executor holding the file bytes — archives are
    * processed in parallel across the cluster. */
  def unzipEntries(files: DataFrame): DataFrame = {
    val enc = Encoders.tuple(Encoders.STRING, Encoders.STRING, Encoders.BINARY)
    files.select(col("path"), col("content"))
      .as[(String, Array[Byte])](Encoders.tuple(Encoders.STRING, Encoders.BINARY))
      .flatMap { case (path, bytes) =>
        val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
        Iterator.continually(zin.getNextEntry)
          .takeWhile(_ != null)
          .filterNot(_.isDirectory)
          .map(e => (path, e.getName, zin.readAllBytes()))
          .toVector
      }(enc)
      .toDF("archive", "entry", "data")
  }

  /** Parse CSV entry bytes into lines → columns (header row = names),
    * mirroring st_read's attribute-table load for a delimited payload. */
  def csvEntry(entries: DataFrame, entryName: String): DataFrame = {
    val strEnc = Encoders.STRING
    val lines = entries.filter(col("entry") === entryName)
      .select(col("data").cast("string"))
      .as[String](strEnc)
      .flatMap(_.split("\n").iterator.map(_.stripSuffix("\r")))(strEnc)
      .filter(length(trim(col("value"))) > 0)
    lines.toDF("line")
  }

  // ——— ESRI shapefile decode (the reference's actual payload) ———
  //
  // `sf::st_read` (crowdsorsa-etl-2023.R:32, 2024.R:34) parses the
  // zipped ESRI layer: geometry from the .shp main file, attributes
  // from the .dbf sidecar, matched positionally by record number.
  // Both layouts are public (ESRI Shapefile Technical Description
  // whitepaper, 1998; dBASE III header spec). Decoding runs inside the
  // executor task that already holds the entry bytes — same
  // distribution story as unzipEntries — and geometry lands directly
  // in the `array<array<struct<x,y>>>` shape GeoFunctions consumes.

  case class GeoPoint(x: Double, y: Double)
  case class ShpRec(archive: String, rec_no: Int, shape_type: Int,
                    rings: Seq[Seq[GeoPoint]])
  case class DbfRec(archive: String, rec_no: Int, attrs: Map[String, String])

  /** .shp main file → records. Record headers and the file header's
    * length are big-endian; shape payloads little-endian. Supported
    * shapes: 0 null, 1 point, 3 polyline, 5 polygon (8/13/15 measured/
    * Z variants share the leading XY layout and parse as their base). */
  private[sources] def parseShp(bytes: Array[Byte]): Seq[(Int, Int, Seq[Seq[GeoPoint]])] = {
    import java.nio.{ByteBuffer, ByteOrder}
    val be = ByteBuffer.wrap(bytes) // JVM default order is big-endian
    val le = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(be.getInt(0) == 9994, s"not a .shp file (magic ${be.getInt(0)})")
    val fileEnd = math.min(bytes.length.toLong, be.getInt(24).toLong * 2).toInt
    val out = Vector.newBuilder[(Int, Int, Seq[Seq[GeoPoint]])]
    var off = 100
    while (off + 8 <= fileEnd) {
      val recNo = be.getInt(off)
      val contentBytes = be.getInt(off + 4) * 2
      val c = off + 8
      val shapeType = le.getInt(c)
      val rings: Seq[Seq[GeoPoint]] = (shapeType % 10) match {
        case 0 => Nil
        case 1 => // point: x,y at c+4
          Seq(Seq(GeoPoint(le.getDouble(c + 4), le.getDouble(c + 12))))
        case 3 | 5 => // polyline/polygon: bbox(32) numParts numPoints parts points
          val numParts = le.getInt(c + 36)
          val numPoints = le.getInt(c + 40)
          val partsAt = c + 44
          val pointsAt = partsAt + 4 * numParts
          val starts = (0 until numParts).map(i => le.getInt(partsAt + 4 * i))
          val ends = starts.drop(1) :+ numPoints
          starts.zip(ends).map { case (s, e) =>
            (s until e).map(i =>
              GeoPoint(le.getDouble(pointsAt + 16 * i),
                       le.getDouble(pointsAt + 16 * i + 8)))
          }
        case t => throw new IllegalArgumentException(s"unsupported shape type $t")
      }
      out += ((recNo, shapeType, rings))
      off = c + contentBytes
    }
    out.result()
  }

  /** .dbf sidecar → (record number, attribute map). Header and record
    * sizes are little-endian; field descriptors are 32 bytes each up
    * to the 0x0D terminator; records are fixed-width ASCII with a
    * leading deletion flag (0x2A = deleted, skipped — st_read drops
    * them too). Values are trimmed strings; numeric typing is left to
    * the caller's cast (mirrors st_read's as-is attribute table). */
  private[sources] def parseDbf(bytes: Array[Byte]): Seq[(Int, Map[String, String])] = {
    import java.nio.{ByteBuffer, ByteOrder}
    val le = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val nRec = le.getInt(4)
    val headerSize = le.getShort(8) & 0xFFFF
    val recSize = le.getShort(10) & 0xFFFF
    val fields = Vector.newBuilder[(String, Int)]
    var off = 32
    while (off < headerSize && bytes(off) != 0x0D) {
      val name = new String(bytes, off, 11, java.nio.charset.StandardCharsets.US_ASCII)
        .takeWhile(_ != '\u0000').trim
      fields += ((name, bytes(off + 16) & 0xFF))
      off += 32
    }
    val fs = fields.result()
    (0 until nRec).flatMap { i =>
      val ro = headerSize + i * recSize
      if (ro + recSize > bytes.length || bytes(ro) == '*') None
      else {
        var fo = ro + 1
        val m = fs.map { case (n, l) =>
          val v = new String(bytes, fo, l, java.nio.charset.StandardCharsets.US_ASCII).trim
          fo += l
          n -> v
        }.toMap
        Some((i + 1, m)) // .dbf row i pairs with .shp record i+1 (1-based)
      }
    }
  }

  /** st_read analog over unzipEntries output: decode every .shp entry
    * to geometry rows and every .dbf entry to attribute rows, then
    * equi-join on (archive, record number) — the positional pairing
    * st_read does within one layer directory. Stays fully distributed:
    * parsing is per-entry inside flatMap tasks, the join shuffles only
    * decoded rows. Column `rings` is GeoFunctions-ready. */
  def shapefile(entries: DataFrame): DataFrame = {
    val shpEnc = Encoders.product[ShpRec]
    val dbfEnc = Encoders.product[DbfRec]
    val binEnc = Encoders.tuple(Encoders.STRING, Encoders.STRING, Encoders.BINARY)
    val typed = entries.select(col("archive"), col("entry"), col("data"))
      .as[(String, String, Array[Byte])](binEnc)
    val shp = typed.filter(_._2.toLowerCase.endsWith(".shp"))
      .flatMap { case (archive, _, data) =>
        parseShp(data).map { case (no, t, rings) => ShpRec(archive, no, t, rings) }
      }(shpEnc)
    val dbf = typed.filter(_._2.toLowerCase.endsWith(".dbf"))
      .flatMap { case (archive, _, data) =>
        parseDbf(data).map { case (no, attrs) => DbfRec(archive, no, attrs) }
      }(dbfEnc)
    shp.toDF().join(dbf.toDF(), Seq("archive", "rec_no"), "left")
      .select(col("archive"), col("rec_no"), col("shape_type"),
        col("rings"), col("attrs"))
  }
}
