package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TarShardsSpec extends SparkSpec {
  import spark.implicits._

  test("tar shards round-trip documents byte-exact") {
    val docs = tables.documents.limit(200)
    val shards = TarShards.tarShards(docs, docsPerShard = 64)
    // shard sizing: ≥2 shards, each ≤64 entries
    val counts = shards.select("shard_id", "n_entries")
      .as[(Long, Int)].collect()
    assert(counts.length > 1 && counts.forall(_._2 <= 64))
    val back = TarShards.untar(shards)
      .select(expr("CAST(substr(name, 1, length(name) - 4) AS BIGINT)").as("doc_id"),
        col("content").cast("string").as("text"))
      .as[(Long, String)].collect().toMap
    val orig = docs.select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(back == orig)
  }

  test("gzipped shards: .tar.gz round-trips and the system tar -tzf reads it") {
    val docs = tables.documents.filter(col("doc_id") < 5)
    val gz = TarShards.gzipShards(TarShards.tarShards(docs, 64))
    val bytes = gz.select("tar").head.getAs[Array[Byte]](0)
    assert((bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b)
    // the loader auto-detects and inflates
    val back = TarShards.untar(gz).select("name").as[String].collect().sorted
    assert(back.toSeq == (0 until 5).map(i => s"$i.txt").sorted)
    // and the system tar agrees it is a valid .tar.gz
    val dir = java.nio.file.Files.createTempDirectory("graft-tgz")
    val f = dir.resolve("shard.tar.gz")
    java.nio.file.Files.write(f, bytes)
    val p = new ProcessBuilder("tar", "-tzf", f.toString)
      .redirectErrorStream(true).start()
    val names = scala.io.Source.fromInputStream(p.getInputStream).getLines().toList
    assert(p.waitFor() == 0 && names.sorted == back.toList)
  }

  test("foreign tars: system-tar archives with subdirectories + 150-char names parse (gnu and pax formats)") {
    // a REAL WebDataset shard written by another tool: subdirectory
    // entries, nested paths, and a >100-char name that forces GNU 'L'
    // (gnu format) or a PAX 'x' header (pax format)
    val dir = java.nio.file.Files.createTempDirectory("graft-foreign")
    val sub = dir.resolve("samples/batch-000")
    java.nio.file.Files.createDirectories(sub)
    val longBase = "sample-" + ("x" * 130) + ".txt" // 141 chars
    val longRel = s"samples/batch-000/$longBase"    // >150 chars total
    java.nio.file.Files.write(sub.resolve(longBase),
      "long-name payload".getBytes("UTF-8"))
    java.nio.file.Files.write(sub.resolve("0.txt"),
      "short payload".getBytes("UTF-8"))
    for (fmt <- Seq("gnu", "pax")) {
      val f = dir.resolve(s"foreign-$fmt.tar")
      val p = new ProcessBuilder("tar", s"--format=$fmt", "-cf", f.toString,
        "-C", dir.toString, "samples").redirectErrorStream(true).start()
      assert(p.waitFor() == 0)
      val bytes = java.nio.file.Files.readAllBytes(f)
      val shard = spark.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row(0L, 2, bytes)),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("shard_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("n_entries",
            org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("tar",
            org.apache.spark.sql.types.BinaryType))))
      val back = TarShards.untar(shard)
        .select("name", "content").as[(String, Array[Byte])].collect().toMap
      // ONLY the two regular files surface — no directory entries, no
      // PAX/longname metadata blocks leaked as samples
      assert(back.keySet == Set(longRel, "samples/batch-000/0.txt"),
        s"[$fmt] got: ${back.keySet}")
      assert(new String(back(longRel), "UTF-8") == "long-name payload")
      assert(new String(back("samples/batch-000/0.txt"), "UTF-8") == "short payload")
    }
  }

  test("writer prefix field: >100-byte names round-trip and the system tar rejoins them") {
    val longName = "deep/nested/prefix-dir-" + ("p" * 60) + "/file-" + ("f" * 80) + ".txt"
    assert(longName.length > 100 && longName.length <= 255)
    val entries = Seq((0L, longName, "prefix payload".getBytes("UTF-8")))
      .toDF("shard_id", "name", "content")
    val shards = TarShards.tarEntryShards(entries)
    // our own loader rejoins prefix + name
    val back = TarShards.untar(shards)
      .select("name", "content").as[(String, Array[Byte])].collect()
    assert(back.length == 1 && back.head._1 == longName)
    assert(new String(back.head._2, "UTF-8") == "prefix payload")
    // and the system tar agrees on the full path
    val dirT = java.nio.file.Files.createTempDirectory("graft-prefix")
    val f = dirT.resolve("shard.tar")
    java.nio.file.Files.write(f, shards.select("tar").head.getAs[Array[Byte]](0))
    val p = new ProcessBuilder("tar", "-tf", f.toString)
      .redirectErrorStream(true).start()
    val names = scala.io.Source.fromInputStream(p.getInputStream).getLines().toList
    assert(p.waitFor() == 0 && names == List(longName), s"tar -tf: $names")
  }

  test("non-ASCII entry names round-trip via an emitted PAX header (the Finnish ö/ä case)") {
    // the reference's own domain: Finnish names carry ö/ä
    // (crowdsorsa-etl-2023.R:88-94 repairs exactly those bytes) — a
    // US-ASCII encode would fold them to '?' and collide names
    val names = Seq("nimi-ä.txt", "järvi/ötökkä.txt")
    val entries = names.zipWithIndex
      .map { case (n, i) => (0L, n, s"payload-$i".getBytes("UTF-8")) }
      .toDF("shard_id", "name", "content")
    val shards = TarShards.tarEntryShards(entries)
    // our loader reads the PAX path back exactly
    val back = TarShards.untar(shards)
      .select("name", "content").as[(String, Array[Byte])].collect()
      .map { case (n, c) => n -> new String(c, "UTF-8") }.toMap
    assert(back == Map("nimi-ä.txt" -> "payload-0",
      "järvi/ötökkä.txt" -> "payload-1"))
    // and the system tar agrees on the exact UTF-8 paths
    val dir = java.nio.file.Files.createTempDirectory("graft-pax-w")
    val f = dir.resolve("shard.tar")
    java.nio.file.Files.write(f, shards.select("tar").head.getAs[Array[Byte]](0))
    val pb = new ProcessBuilder("tar", "-tf", f.toString)
      .redirectErrorStream(true)
    pb.environment().put("LC_ALL", "C.UTF-8") // C locale octal-escapes non-ASCII in listings
    val p = pb.start()
    val listed = scala.io.Source.fromInputStream(p.getInputStream, "UTF-8")
      .getLines().toList
    assert(p.waitFor() == 0, s"tar -tf: $listed")
    assert(listed.sorted == names.sorted, s"tar -tf: $listed")
  }

  test("shard bytes are REAL tar: the system tar lists and extracts them") {
    val one = TarShards.tarShards(tables.documents.filter(col("doc_id") < 5), 64)
      .select("tar").head.getAs[Array[Byte]](0)
    val dir = java.nio.file.Files.createTempDirectory("graft-tar")
    val f = dir.resolve("shard.tar")
    java.nio.file.Files.write(f, one)
    // list
    val list = new ProcessBuilder("tar", "-tf", f.toString)
      .redirectErrorStream(true).start()
    val names = scala.io.Source.fromInputStream(list.getInputStream)
      .getLines().toList
    assert(list.waitFor() == 0, s"tar -tf failed: $names")
    assert(names.sorted == (0 until 5).map(i => s"$i.txt").sorted.toList)
    // extract + compare one payload
    val ex = new ProcessBuilder("tar", "-xf", f.toString, "-C", dir.toString)
      .redirectErrorStream(true).start()
    assert(ex.waitFor() == 0)
    val text3 = new String(
      java.nio.file.Files.readAllBytes(dir.resolve("3.txt")), "UTF-8")
    val want = tables.documents.filter(col("doc_id") === 3)
      .select("text").as[String].head()
    assert(text3 == want)
  }
}
