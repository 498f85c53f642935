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

  // ——— byte-level writers for a minimal but spec-conformant ESRI layer ———

  /** Polygon-type .shp: header + one record per ring list. */
  private def shpBytes(polys: Seq[Seq[(Double, Double)]]): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    val contents = polys.map { ring =>
      val n = ring.size
      val c = ByteBuffer.allocate(4 + 32 + 8 + 4 + 16 * n).order(ByteOrder.LITTLE_ENDIAN)
      c.putInt(5) // polygon
      c.putDouble(ring.map(_._1).min); c.putDouble(ring.map(_._2).min)
      c.putDouble(ring.map(_._1).max); c.putDouble(ring.map(_._2).max)
      c.putInt(1).putInt(n).putInt(0) // one part starting at point 0
      ring.foreach { case (x, y) => c.putDouble(x); c.putDouble(y) }
      c.array()
    }
    val totalLen = 100 + contents.map(8 + _.length).sum
    val bb = ByteBuffer.allocate(totalLen) // big-endian default
    bb.putInt(0, 9994)
    bb.putInt(24, totalLen / 2)
    val le = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    le.putInt(0, 1000); le.putInt(4, 5) // version, shape type
    System.arraycopy(le.array(), 0, bb.array(), 28, 8)
    var off = 100
    contents.zipWithIndex.foreach { case (c, i) =>
      bb.putInt(off, i + 1)           // record number, 1-based
      bb.putInt(off + 4, c.length / 2) // content length in 16-bit words
      System.arraycopy(c, 0, bb.array(), off + 8, c.length)
      off += 8 + c.length
    }
    bb.array()
  }

  /** dBASE III .dbf with C-typed fields, fixed width 10. */
  private def dbfBytes(fieldNames: Seq[String], rows: Seq[Seq[String]],
                       deleted: Set[Int] = Set.empty): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    val w = 10
    val headerSize = 32 + 32 * fieldNames.size + 1
    val recSize = 1 + w * fieldNames.size
    val bb = ByteBuffer.allocate(headerSize + recSize * rows.size + 1)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put(0, 0x03.toByte)
    bb.putInt(4, rows.size)
    bb.putShort(8, headerSize.toShort)
    bb.putShort(10, recSize.toShort)
    fieldNames.zipWithIndex.foreach { case (n, i) =>
      val off = 32 + 32 * i
      n.getBytes("US-ASCII").take(11).zipWithIndex.foreach { case (b, j) => bb.put(off + j, b) }
      bb.put(off + 11, 'C'.toByte)
      bb.put(off + 16, w.toByte)
    }
    bb.put(headerSize - 1, 0x0D.toByte)
    rows.zipWithIndex.foreach { case (r, i) =>
      val off = headerSize + recSize * i
      bb.put(off, if (deleted(i)) '*'.toByte else ' '.toByte)
      r.zipWithIndex.foreach { case (v, j) =>
        v.padTo(w, ' ').getBytes("US-ASCII").take(w).zipWithIndex
          .foreach { case (b, k) => bb.put(off + 1 + w * j + k, b) }
      }
    }
    bb.put(bb.capacity() - 1, 0x1A.toByte)
    bb.array()
  }

  test("shapefile decode: zipped .shp+.dbf -> geometry rings + joined attributes") {
    val square = Seq((0.0, 0.0), (0.0, 3.0), (4.0, 3.0), (4.0, 0.0), (0.0, 0.0))
    val tri = Seq((10.0, 10.0), (10.0, 12.0), (12.0, 10.0), (10.0, 10.0))
    val dir = java.nio.file.Files.createTempDirectory("graft-shp").toFile
    val zipFile = new File(dir, "layer2023.zip")
    val zos = new ZipOutputStream(new FileOutputStream(zipFile))
    zos.putNextEntry(new ZipEntry("plots.shp"))
    zos.write(shpBytes(Seq(square, tri))); zos.closeEntry()
    zos.putNextEntry(new ZipEntry("plots.dbf"))
    zos.write(dbfBytes(Seq("LAJI", "VUOSI"),
      Seq(Seq("lupiini", "2023"), Seq("kurtturuusu", "2023")))); zos.closeEntry()
    zos.close()

    val rows = BinaryIngest.shapefile(
        BinaryIngest.unzipEntries(BinaryIngest.binaryFiles(spark, zipFile.getAbsolutePath)))
      .orderBy("rec_no")
    val got = rows.select("rec_no", "shape_type", "attrs").collect()
    assert(got.length == 2)
    assert(got.map(_.getInt(1)).toSeq == Seq(5, 5))
    assert(got(0).getMap[String, String](2)("LAJI") == "lupiini")
    // 11-char value truncated to the field's fixed width of 10
    assert(got(1).getMap[String, String](2)("LAJI") == "kurtturuus")
    assert(got(0).getMap[String, String](2)("VUOSI") == "2023")
    // geometry survives byte-exact: st_area analog over the parsed ring
    val areas = rows.select(org.apache.spark.sql.functions.col("rec_no"),
        graft.functions.GeoFunctions.polygonArea(
          org.apache.spark.sql.functions.element_at(
            org.apache.spark.sql.functions.col("rings"), 1)).as("a"))
      .as[(Int, Double)].collect().toMap
    assert(areas(1) == 12.0 && areas(2) == 2.0, s"areas $areas")
  }

  test("shapefile decode skips dbf-deleted rows like st_read") {
    val ring = Seq((0.0, 0.0), (0.0, 1.0), (1.0, 1.0), (0.0, 0.0))
    val dir = java.nio.file.Files.createTempDirectory("graft-shp2").toFile
    val zipFile = new File(dir, "del.zip")
    val zos = new ZipOutputStream(new FileOutputStream(zipFile))
    zos.putNextEntry(new ZipEntry("a.shp"))
    zos.write(shpBytes(Seq(ring, ring))); zos.closeEntry()
    zos.putNextEntry(new ZipEntry("a.dbf"))
    zos.write(dbfBytes(Seq("ID"), Seq(Seq("one"), Seq("two")), deleted = Set(1)))
    zos.closeEntry(); zos.close()
    val rows = BinaryIngest.shapefile(
        BinaryIngest.unzipEntries(BinaryIngest.binaryFiles(spark, zipFile.getAbsolutePath)))
      .orderBy("rec_no").collect()
    // geometry row 2 survives (left join) but carries no attributes
    assert(rows.length == 2)
    assert(rows(0).getMap[String, String](4)("ID") == "one")
    assert(rows(1).isNullAt(4))
  }
}
