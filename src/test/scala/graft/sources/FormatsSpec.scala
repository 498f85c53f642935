package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ORC round-trip: the engine's tables are parquet, but a warehouse
  * ingest surface must also read/write ORC (Spark bundles the reader —
  * same pushdown/pruning machinery as parquet). */
class OrcRoundTripSpec extends SparkSpec {

  test("documents survive an ORC write/read round-trip bit-exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString + "/docs"
    val docs = tables.documents
    docs.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == docs.schema)
    // bit_xor: order-independent row-hash fold that can't overflow ANSI
    val h = (df: org.apache.spark.sql.DataFrame) =>
      df.agg(bit_xor(xxhash64(df.columns.sorted.map(col): _*)).as("h"),
        count(lit(1)).as("n")).head()
    assert(h(back) == h(docs))
  }

  test("ORC scan prunes columns and pushes filters like parquet") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc2").toString + "/docs"
    tables.documents.write.mode("overwrite").orc(dir)
    val q = spark.read.orc(dir).filter(col("doc_id") < 10).select(col("doc_id"), col("lang"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,10)]") ||
      plan.contains("LessThan(doc_id,10)"), plan)
    assert(q.count() == tables.documents.filter(col("doc_id") < 10).count())
  }
}

/** Schema evolution: a long-lived table accretes columns over time;
  * readers must see the union schema with nulls for pre-evolution
  * files (parquet mergeSchema). */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("mergeSchema reads old+new files under the union schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft-evo").toString + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.mode("overwrite").parquet(dir)
    Seq((3L, "c", 9.5)).toDF("id", "name", "score")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("id", "name", "score"))
    val rows = merged.select(col("id"), col("score"))
      .as[(Long, Option[Double])].collect().toMap
    assert(rows(1L).isEmpty && rows(2L).isEmpty) // pre-evolution files -> null
    assert(rows(3L).contains(9.5))
  }
}

/** Count-min sketch: the frequency-estimation companion to the HLL
  * distinct sketches (SketchSpec) — overestimates only, bounded by
  * eps × stream size with the configured confidence. */
class JsonLinesSpec extends SparkSpec {

  test("JSONL round-trip: decode fidelity exact, corrupt line counted not dropped") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-spec").toString
    Seq((1L, "alpha beta", "en", "s0", 10L), (2L, "gamma", "de", "s1", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = JsonLines.roundtrip(Tables(spark, dir))
      .as[(Long, Long, Long, Long)].head()
    assert(r == ((2L, 2L, 15L, 1L)))
  }
}

class CountMinSpec extends SparkSpec {

  test("count-min estimates are overestimates within the eps bound") {
    val ev = tables.events.select(col("event_type"))
    val total = ev.count()
    val eps = 0.01
    val sketch = ev.stat.countMinSketch("event_type", eps = eps, confidence = 0.99, seed = 42)
    val truth = ev.groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.foreach { case (k, n) =>
      val est = sketch.estimateCount(k)
      assert(est >= n, s"$k: count-min must never underestimate")
      assert(est <= n + math.ceil(eps * total).toLong * 2,
        s"$k: est $est too far above $n")
    }
  }
}
