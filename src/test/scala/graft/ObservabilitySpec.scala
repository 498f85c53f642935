package graft

import org.apache.spark.sql.functions._

class ObservabilitySpec extends SparkSpec {

  test("observe metrics ride the job: per-stage row accounting, no extra pass") {
    val docs = tables.documents
    val (in, inObs) = Observability.rowAudit(docs, "ingest",
      Seq(sum(col("n_chars")).as("chars")))
    val filtered = in.filter(col("n_chars").between(100, 400))
    val (out, outObs) = Observability.rowAudit(filtered, "post_filter")
    val kept = out.count() // ONE action materializes both observations
    val inM = inObs.get
    val outM = outObs.get
    assert(inM("rows") == docs.count())
    assert(outM("rows") == kept)
    assert(inM("chars").asInstanceOf[Long] > 0L)
    assert(outM("rows").asInstanceOf[Long] < inM("rows").asInstanceOf[Long])
  }
}
