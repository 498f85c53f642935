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
