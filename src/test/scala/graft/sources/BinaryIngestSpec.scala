package graft.sources

import graft.SparkSpec
import java.io.{File, FileOutputStream}
import java.util.zip.{ZipEntry, ZipOutputStream}

class BinaryIngestSpec extends SparkSpec {
  import spark.implicits._

  test("zip archive ingest: binaryFile scan -> distributed entry expansion -> rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zip").toFile
    val zipFile = new File(dir, "data2023.zip")
    val zos = new ZipOutputStream(new FileOutputStream(zipFile))
    zos.putNextEntry(new ZipEntry("obs.csv"))
    zos.write("id,laji\n1,lupiini\n2,kurtturuusu\n".getBytes("UTF-8"))
    zos.closeEntry()
    zos.putNextEntry(new ZipEntry("readme.txt"))
    zos.write("ignore me".getBytes("UTF-8"))
    zos.closeEntry()
    zos.close()

    val files = BinaryIngest.binaryFiles(spark, zipFile.getAbsolutePath)
    val entries = BinaryIngest.unzipEntries(files)
    val names = entries.select("entry").as[String].collect().toSet
    assert(names == Set("obs.csv", "readme.txt"))

    val lines = BinaryIngest.csvEntry(entries, "obs.csv")
      .as[String].collect().toSeq
    assert(lines == Seq("id,laji", "1,lupiini", "2,kurtturuusu"))
  }
}
