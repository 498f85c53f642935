package graft.sinks

import graft.SparkSpec
import graft.etl.DocumentAssembly

class HttpPushSinkSpec extends SparkSpec {

  test("push sink: per-partition logs, stub statuses, token redaction") {
    val docs = DocumentAssembly.assemble(tables).limit(200)
    val logDir = java.nio.file.Files.createTempDirectory("graft-push").toString
    HttpPushSink.push(docs, "event_id", "doc", new HttpPushSink.StubTransport,
      "https://api.example.test/v0/warehouse/push", logDir, token = "TOPSECRET")

    val files = new java.io.File(logDir).listFiles().filter(_.getName.endsWith(".jsonl"))
    assert(files.nonEmpty)
    val lines = files.flatMap(f =>
      scala.io.Source.fromFile(f, "UTF-8").getLines().toList)
    assert(lines.length == 200)
    // redaction: the token never reaches the log (2023.R:226 semantics)
    assert(!lines.exists(_.contains("TOPSECRET")))
    assert(lines.forall(_.contains("access_token=\"")))
    // stub: doc id % 97 == 0 -> ERROR/500, else INFO/200
    val errors = lines.filter(_.contains("\"status\":500"))
    assert(errors.nonEmpty && errors.forall(_.contains("\"level\":\"ERROR\"")))
    assert(lines.filter(_.contains("\"status\":200"))
      .forall(_.contains("\"level\":\"INFO\"")))
  }

  test("push under a deploy profile targets the profile's host") {
    val docs = DocumentAssembly
      .assemble(tables, graft.etl.DeployProfile.Test).limit(20)
    val logDir = java.nio.file.Files.createTempDirectory("graft-push-t").toString
    HttpPushSink.push(docs, "event_id", "doc", new HttpPushSink.StubTransport,
      graft.etl.DeployProfile.Test, logDir)
    val lines = new java.io.File(logDir).listFiles()
      .filter(_.getName.endsWith(".jsonl"))
      .flatMap(f => scala.io.Source.fromFile(f, "UTF-8").getLines().toList)
    assert(lines.length == 20)
    // every push went at the TEST endpoint (the coupled switch)
    assert(lines.forall(_.contains(
      "https://apitest.laji.fi/v0/warehouse/push")))
    // and the resolved token (env fallback here) is redacted
    assert(!lines.exists(_.contains("SECRET123")))
  }
}
