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
}
