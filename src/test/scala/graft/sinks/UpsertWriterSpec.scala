package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._

object FlakyTransport {
  val calls = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
}

class UpsertWriterSpec extends SparkSpec {
  import spark.implicits._

  test("merge keeps newest version per key and inserts new keys") {
    val path = java.nio.file.Files.createTempDirectory("graft-upsert").toString + "/t"
    UpsertWriter.init(Seq(
      (1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L)).toDF("id", "v", "version"), path)
    UpsertWriter.merge(spark, Seq(
      (2L, "b2", 2L),   // newer version -> replaces
      (3L, "c0", 0L),   // older version -> ignored
      (4L, "d", 1L)     // new key -> inserted
    ).toDF("id", "v", "version"), path, "id", "version")
    val r = spark.read.parquet(path).select("id", "v")
      .as[(Long, String)].collect().toMap
    assert(r == Map(1L -> "a", 2L -> "b2", 3L -> "c", 4L -> "d"))
  }

  test("merge is idempotent (re-applying the same updates changes nothing)") {
    val path = java.nio.file.Files.createTempDirectory("graft-upsert2").toString + "/t"
    UpsertWriter.init(Seq((1L, "a", 1L)).toDF("id", "v", "version"), path)
    val up = Seq((1L, "a2", 2L)).toDF("id", "v", "version")
    UpsertWriter.merge(spark, up, path, "id", "version")
    UpsertWriter.merge(spark, up, path, "id", "version")
    val r = spark.read.parquet(path).as[(Long, String, Long)].collect().toSeq
    assert(r == Seq((1L, "a2", 2L)))
  }

  test("duplicate keys at the same version resolve deterministically") {
    // two updates with the same (key, version): survivor must be the same
    // across repeated merges from differently-partitioned inputs
    def run(parts: Int): String = {
      val path = java.nio.file.Files.createTempDirectory("graft-upsert3").toString + "/t"
      UpsertWriter.init(Seq((1L, "a", 1L)).toDF("id", "v", "version"), path)
      val up = Seq((1L, "x", 2L), (1L, "y", 2L), (1L, "z", 2L))
        .toDF("id", "v", "version").repartition(parts)
      UpsertWriter.merge(spark, up, path, "id", "version")
      spark.read.parquet(path).select("v").as[String].collect().head
    }
    val picks = Seq(run(1), run(3), run(8), run(1))
    assert(picks.distinct.size == 1, s"nondeterministic survivor: $picks")
  }

  test("old directory is preserved aside until the new table is live") {
    // _old leftovers from a prior crashed merge must not break the next one
    val path = java.nio.file.Files.createTempDirectory("graft-upsert4").toString + "/t"
    UpsertWriter.init(Seq((1L, "a", 1L)).toDF("id", "v", "version"), path)
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(path + "_old"))
    UpsertWriter.merge(spark, Seq((1L, "b", 2L)).toDF("id", "v", "version"),
      path, "id", "version")
    assert(spark.read.parquet(path).select("v").as[String].collect().toSeq == Seq("b"))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(path + "_old")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(path + "_merge_tmp")))
  }

  test("push sink retries transient 5xx and logs attempt counts") {
    import graft.etl.DocumentAssembly
    val docs = DocumentAssembly.assemble(tables).limit(10)
    val logDir = java.nio.file.Files.createTempDirectory("graft-retry").toString
    FlakyTransport.calls.clear()
    val flaky = new HttpPushSink.PushTransport {
      override def post(url: String, payload: String): Int = {
        val key = payload.hashCode.toString
        val n = FlakyTransport.calls.merge(key, 1, (a, b) => a + b)
        if (n == 1) 503 else 200 // first attempt fails, retry succeeds
      }
    }
    HttpPushSink.push(docs, "event_id", "doc", flaky,
      "https://api.example.test/push", logDir, token = "TOK", maxRetries = 2)
    val lines = new java.io.File(logDir).listFiles()
      .filter(_.getName.endsWith(".jsonl"))
      .flatMap(f => scala.io.Source.fromFile(f, "UTF-8").getLines().toList)
    assert(lines.length == 10)
    assert(lines.forall(l => l.contains("\"status\":200") && l.contains("\"attempts\":2")))
  }
}
