package graft.streaming

import graft.SparkSpec
import graft.operators.GraphAnnIndex
import org.apache.spark.sql.functions.col

/** Streaming vector ingest into the stored graph-ANN index: gated
  * admission against everything indexed so far, and inserted vectors
  * searchable by the NEXT micro-batch without restart. */
class GraphStreamSpec extends SparkSpec {
  import spark.implicits._

  private def basis(i: Int): Seq[Float] =
    Seq.tabulate(64)(d => if (d == i) 1f else 0f)

  test("foreachBatch graph ingest: near-dups gated, new vectors searchable next batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    GraphAnnIndex.writeIndex(
      (0 until 12).map(i => (i.toLong, basis(i))).toDF("vec_id", "embedding"),
      "gstridx")
    graft.CacheRegistry.drain()

    val admitted = scala.collection.mutable.ArrayBuffer.empty[Long]
    val input = MemoryStream[(Long, Seq[Float])](spark)
    val q = input.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch(GraphStream.ingestBatch("gstridx",
        dropCosine = Some(0.9)) { (rows, _) =>
        admitted ++= rows.select("vec_id")
          .as[Long](spark.implicits.newLongEncoder).collect()
      })
      .start()
    try {
      // batch 1: 100 copies seed 0 (gated out via the stored graph),
      // 101 is a fresh direction (admitted + inserted)
      input.addData((100L, basis(0)), (101L, basis(20)))
      q.processAllAvailable()
      assert(admitted.toSet == Set(101L), s"batch 1 admitted $admitted")
      // batch 2: 200 copies 101 — gated out ONLY if batch 1's insert
      // made 101 searchable; 201 is fresh
      input.addData((200L, basis(20)), (201L, basis(30)))
      q.processAllAvailable()
      assert(admitted.toSet == Set(101L, 201L), s"batch 2 admitted $admitted")
    } finally q.stop()
    // the inserted vectors answer a direct search afterwards too
    val hit = GraphAnnIndex.search(spark,
        Seq((900000L, basis(30))).toDF("vec_id", "embedding"),
        "gstridx", k = 1)
      .select("neighbor_id").as[Long].head()
    assert(hit == 201L, s"post-stream search found $hit")
    graft.CacheRegistry.drain()
    spark.catalog.clearCache()
  }
}
