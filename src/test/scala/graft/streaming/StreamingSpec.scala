package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("windowed counts: streaming result converges to the batch plan's") {
    val input = MemoryStream[(Timestamp, String)](spark)
    val df = input.toDF().toDF("ts", "event_type")
    val q = EventStreams.windowedCounts(df)
      .writeStream.format("memory").queryName("wincounts")
      .outputMode("complete").start()
    try {
      input.addData(
        (Timestamp.valueOf("2024-01-01 10:05:00"), "click"),
        (Timestamp.valueOf("2024-01-01 10:55:00"), "click"),
        (Timestamp.valueOf("2024-01-01 11:05:00"), "click"),
        (Timestamp.valueOf("2024-01-01 10:30:00"), "view"))
      q.processAllAvailable()
      val r = spark.table("wincounts")
        .select(col("win_start").cast("string"), col("event_type"), col("n"))
        .as[(String, String, Long)].collect().toSet
      assert(r == Set(
        ("2024-01-01 10:00:00", "click", 2L),
        ("2024-01-01 11:00:00", "click", 1L),
        ("2024-01-01 10:00:00", "view", 1L)))
    } finally q.stop()
  }

  test("session_window stream: sessions finalize when the watermark passes") {
    val input = MemoryStream[(Long, Timestamp)](spark)
    val df = input.toDF().toDF("user_id", "ts")
    val q = EventStreams.sessionWindowStream(df)
      .writeStream.format("memory").queryName("sesswin")
      .outputMode("append").start()
    try {
      // one 2-event session for user 1, then a far-future event whose
      // watermark closes it
      input.addData(
        (1L, Timestamp.valueOf("2024-01-01 10:00:00")),
        (1L, Timestamp.valueOf("2024-01-01 10:10:00")))
      q.processAllAvailable()
      input.addData((9L, Timestamp.valueOf("2024-01-01 14:00:00")))
      q.processAllAvailable()
      input.addData((9L, Timestamp.valueOf("2024-01-01 18:00:00")))
      q.processAllAvailable()
      val r = spark.table("sesswin")
        .select(col("user_id"), col("s_start").cast("string"),
          col("s_end").cast("string"), col("n_events"))
        .as[(Long, String, String, Long)].collect().toSet
      // user 1's session: [10:00, 10:10 + 30min gap), 2 events
      assert(r.contains((1L, "2024-01-01 10:00:00", "2024-01-01 10:40:00", 2L)))
      // user 9's first session finalized by the 18:00 watermark
      assert(r.contains((9L, "2024-01-01 14:00:00", "2024-01-01 14:30:00", 1L)))
    } finally q.stop()
  }

  test("session stream: flatMapGroupsWithState closes sessions on gap/watermark") {
    import SessionStream._
    val input = MemoryStream[Ev](spark)
    val q = SessionStream.sessions(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessout")
      .outputMode("append").start()
    try {
      input.addData(
        Ev(1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L),
        Ev(1L, Timestamp.valueOf("2024-01-01 10:10:00"), 2L))
      q.processAllAvailable()
      // jump event time far ahead: watermark passes 10:10+30min -> session closes
      input.addData(Ev(2L, Timestamp.valueOf("2024-01-01 13:00:00"), 3L))
      q.processAllAvailable()
      input.addData(Ev(2L, Timestamp.valueOf("2024-01-01 16:00:00"), 4L))
      q.processAllAvailable()
      val r = spark.table("sessout")
        .select(col("user_id"), col("n_events"),
          col("session_start").cast("string"), col("session_end").cast("string"))
        .as[(Long, Long, String, String)].collect().toSet
      assert(r.contains((1L, 2L, "2024-01-01 10:00:00", "2024-01-01 10:10:00")), s"got $r")
    } finally q.stop()
  }

  test("stream-static join: events enriched by a broadcast dimension, counted per segment") {
    val input = MemoryStream[(Timestamp, Long)](spark)
    val dim = Seq((1L, "free"), (2L, "pro"), (3L, "pro")).toDF("user_id", "segment")
    val df = input.toDF().toDF("ts", "user_id")
    val q = EventStreams.enrichedWindowCounts(df, dim)
      .writeStream.format("memory").queryName("enriched")
      .outputMode("complete").start()
    try {
      input.addData(
        (Timestamp.valueOf("2024-01-01 10:05:00"), 1L),
        (Timestamp.valueOf("2024-01-01 10:15:00"), 2L),
        (Timestamp.valueOf("2024-01-01 10:25:00"), 3L),
        (Timestamp.valueOf("2024-01-01 11:25:00"), 3L),
        (Timestamp.valueOf("2024-01-01 10:35:00"), 99L)) // no dim row -> dropped
      q.processAllAvailable()
      val r = spark.table("enriched")
        .select(col("win_start").cast("string"), col("segment"), col("n"))
        .as[(String, String, Long)].collect().toSet
      assert(r == Set(
        ("2024-01-01 10:00:00", "free", 1L),
        ("2024-01-01 10:00:00", "pro", 2L),
        ("2024-01-01 11:00:00", "pro", 1L)))
    } finally q.stop()
  }

  test("watermarked stream-stream join: purchases match clicks in the preceding hour") {
    val pIn = MemoryStream[(Long, Long, Timestamp)](spark)
    val cIn = MemoryStream[(Long, Long, Timestamp)](spark)
    def df(m: MemoryStream[(Long, Long, Timestamp)]) =
      m.toDF().toDF("user_id", "event_id", "ts")
    val q = EventStreams.purchaseClickJoin(df(pIn), df(cIn))
      .writeStream.format("memory").queryName("ssjoin").outputMode("append").start()
    try {
      cIn.addData((1L, 100L, Timestamp.valueOf("2024-01-01 10:30:00")),
                  (1L, 101L, Timestamp.valueOf("2024-01-01 08:00:00"))) // too old
      pIn.addData((1L, 200L, Timestamp.valueOf("2024-01-01 11:00:00")))
      q.processAllAvailable()
      val r = spark.table("ssjoin").select("purchase_id", "click_id")
        .as[(Long, Long)].collect().toSet
      assert(r == Set((200L, 100L)), s"got $r")
    } finally q.stop()
  }

  test("left-outer stream-stream join emits unmatched purchases after eviction") {
    val pIn = MemoryStream[(Long, Long, Timestamp)](spark)
    val cIn = MemoryStream[(Long, Long, Timestamp)](spark)
    def df(m: MemoryStream[(Long, Long, Timestamp)]) =
      m.toDF().toDF("user_id", "event_id", "ts")
    val q = EventStreams.purchaseClickJoinOuter(df(pIn), df(cIn))
      .writeStream.format("memory").queryName("ssjoin_outer").outputMode("append").start()
    try {
      cIn.addData((1L, 100L, Timestamp.valueOf("2024-01-01 10:30:00")))
      pIn.addData((1L, 200L, Timestamp.valueOf("2024-01-01 11:00:00")), // matches 100
                  (2L, 201L, Timestamp.valueOf("2024-01-01 11:00:00"))) // no click ever
      q.processAllAvailable()
      // advance BOTH watermarks far past 11:00 so 201's window provably
      // can't match anymore and the null row is evicted+emitted
      cIn.addData((9L, 900L, Timestamp.valueOf("2024-01-01 15:00:00")))
      pIn.addData((9L, 901L, Timestamp.valueOf("2024-01-01 15:00:00")))
      q.processAllAvailable()
      cIn.addData((9L, 902L, Timestamp.valueOf("2024-01-01 16:00:00")))
      pIn.addData((9L, 903L, Timestamp.valueOf("2024-01-01 16:00:00")))
      q.processAllAvailable()
      val r = spark.table("ssjoin_outer").select("purchase_id", "click_id")
        .as[(Long, Option[Long])].collect().toMap
      assert(r(200L).contains(100L), s"matched row wrong: $r")
      assert(r.contains(201L) && r(201L).isEmpty, s"unmatched purchase missing: $r")
    } finally q.stop()
  }

  test("foreachBatch sink: incremental parquet appends with batch ids") {
    val input = MemoryStream[(Timestamp, String)](spark)
    val outDir = java.nio.file.Files.createTempDirectory("graft-fb").toString
    val q = input.toDF().toDF("ts", "event_type")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        batch.withColumn("batch_id", lit(id))
          .write.mode("append").parquet(outDir)
      }
      .start()
    try {
      input.addData((Timestamp.valueOf("2024-01-01 10:00:00"), "click"))
      q.processAllAvailable()
      input.addData((Timestamp.valueOf("2024-01-01 11:00:00"), "view"))
      q.processAllAvailable()
      val out = spark.read.parquet(outDir)
      assert(out.count() == 2)
      assert(out.select("batch_id").distinct().count() == 2)
    } finally q.stop()
  }

  test("streaming dedup: dropDuplicatesWithinWatermark on content hash") {
    val input = MemoryStream[(Timestamp, String)](spark)
    val docs = input.toDF().toDF("ts", "text")
      .withColumn("content_hash", md5(col("text")))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("content_hash")
    val q = docs.writeStream.format("memory").queryName("streamdedup")
      .outputMode("append").start()
    try {
      input.addData(
        (Timestamp.valueOf("2024-01-01 10:00:00"), "same text"),
        (Timestamp.valueOf("2024-01-01 10:01:00"), "same text"),   // dup within watermark
        (Timestamp.valueOf("2024-01-01 10:02:00"), "other text"))
      q.processAllAvailable()
      val texts = spark.table("streamdedup").select("text").as[String].collect().toSeq
      assert(texts.sorted == Seq("other text", "same text"), s"got $texts")
    } finally q.stop()
  }

  test("streaming dedup ingest: stored index drops cross-batch near-dups and grows") {
    import graft.operators.DedupIndex
    // day-0 seed corpus → stored index
    val seed = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten eleven twelve"))
      .toDF("doc_id", "text")
    DedupIndex.writeIndex(seed, "stridx")
    graft.CacheRegistry.drain()

    val input = MemoryStream[(Long, String)](spark)
    val acceptedIds = scala.collection.mutable.Set[Long]()
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch(DedupStream.dedupBatch("stridx") { (accepted, _) =>
        acceptedIds ++= accepted.select("doc_id").as[Long](spark.implicits.newLongEncoder).collect()
      })
      .start()
    try {
      // batch 1: doc 10 copies seed doc 1 (dropped via the index),
      // doc 11 is fresh (accepted and appended)
      input.addData(
        (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (11L, "red orange yellow green blue indigo violet ultraviolet infrared xray"))
      q.processAllAvailable()
      assert(acceptedIds.toSet == Set(11L), s"batch 1 accepted $acceptedIds")
      // batch 2: doc 20 copies doc 11 — it is only dropped if batch 1's
      // APPEND actually reached the index; doc 21 is fresh
      input.addData(
        (20L, "red orange yellow green blue indigo violet ultraviolet infrared xray"),
        (21L, "gold silver bronze copper iron nickel zinc tin lead mercury"))
      q.processAllAvailable()
      assert(acceptedIds.toSet == Set(11L, 21L), s"batch 2 accepted $acceptedIds")
    } finally q.stop()
    // the index now holds exactly seed + accepted signatures, so a
    // fresh (batch) probe of batch-1/2 content dedups against all of it
    val indexed = spark.table("stridx_bands").select("dup_of").distinct()
      .as[Long].collect().toSet
    assert(indexed == Set(1L, 2L, 11L, 21L), s"index holds $indexed")
    graft.CacheRegistry.drain()
  }

  test("advance() transition function (pure kernel)") {
    import SessionStream._
    def ev(u: Long, s: String, id: Long) = Ev(u, Timestamp.valueOf(s), id)
    val gap = gapMs(30)
    val (closed, open) = advance(None, Seq(
      ev(1, "2024-01-01 10:00:00", 1), ev(1, "2024-01-01 10:20:00", 2),
      ev(1, "2024-01-01 11:30:00", 3)), gap)
    assert(closed.map(_.n) == Seq(2))
    assert(open.exists(_.n == 1))
  }

  test("streaming priority sample equals the batch operator over the same rows") {
    import SampleStream._
    val t = tables
    // the real documents table, delivered in two arbitrary micro-batches
    // (order must not matter), with one row re-delivered (at-least-once)
    val docs = t.documents.select($"source", $"doc_id", $"n_chars")
      .as[Doc].collect().toSeq
    val (b1, b2) = docs.partition(_.doc_id % 3 == 0)
    val input = MemoryStream[Doc](spark)
    val q = SampleStream.sampled(input.toDS(), k = 5)
      .writeStream.format("memory").queryName("psample")
      .outputMode("update").start()
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2 :+ b1.head: _*) // re-deliver one row
      q.processAllAvailable()
      // the memory sink accumulates every update-mode emission, so the
      // batch sample's rows must all appear (they ARE the final
      // emission), and the pure merge kernel must reproduce the batch
      // sample exactly from the full row set in any delivery order
      val batch = graft.operators.Curation.weightedSample(t, k = 5)
        .select($"source", $"doc_id").as[(String, Long)].collect().toSet
      val sink = spark.table("psample")
        .select($"source", $"doc_id").as[(String, Long)].collect().toSet
      assert(batch.subsetOf(sink),
        s"missing from stream sink: ${batch -- sink}")
      // and merge() — the state kernel — reproduces the batch sample
      // exactly from the full row set, any delivery order
      val fin = docs.groupBy(_.source).toSeq.flatMap { case (s, ds) =>
        SampleStream.merge(Nil, scala.util.Random.shuffle(ds), 5)
          .map { case (_, id, _) => (s, id) }
      }.toSet
      assert(fin == batch)
    } finally q.stop()
  }

  test("streaming count-min counters are bit-equal to the batch sketch") {
    import graft.operators.TextAnalysis
    val t = tables
    val texts = t.documents.select($"text").as[String].collect().toSeq
    val (b1, b2) = texts.zipWithIndex.partition(_._2 % 3 == 0)
    val input = MemoryStream[String](spark)
    val depth = 4; val width = 64
    val q = SketchStream.counters(input.toDF().toDF("text"), depth, width)
      .writeStream.format("memory").queryName("cms")
      .outputMode("complete").start()
    try {
      input.addData(b1.map(_._1): _*)
      q.processAllAvailable()
      // prefix equivalence: streaming state after batch 1 == batch
      // sketch over batch 1's rows (a linear sketch merges exactly)
      val sink1 = spark.table("cms")
        .as[(Long, Long, Long)].collect().toSet
      val batch1 = TextAnalysis.cmsCounters(
        b1.map(_._1).toDF("text"), depth, width)
        .as[(Long, Long, Long)].collect().toSet
      assert(sink1 == batch1)
      input.addData(b2.map(_._1): _*)
      q.processAllAvailable()
      val sink2 = spark.table("cms")
        .as[(Long, Long, Long)].collect().toSet
      val batch2 = TextAnalysis.cmsCounters(texts.toDF("text"), depth, width)
        .as[(Long, Long, Long)].collect().toSet
      assert(sink2 == batch2)
      // bounded state: the grid never exceeds depth×width regardless
      // of vocabulary growth
      assert(sink2.size <= depth * width)
      // the streaming-maintained table answers the batch probe: every
      // token's min-over-rows estimate upper-bounds its exact count
      // (CMS one-sided error), buckets from the SAME shared expression
      val probe = texts.toDF("text")
        .select(explode(split($"text", " ")).as("tok"))
        .groupBy($"tok").agg(count(lit(1)).cast("long").as("n"))
        .select($"tok", $"n", array((0 until depth).map(r =>
          TextAnalysis.cmsBucket(r, $"tok", width)): _*).as("bs"))
        .as[(String, Long, Seq[Long])].collect()
      val grid = sink2.map { case (r, b, c) => (r, b) -> c }.toMap
      assert(probe.nonEmpty)
      probe.foreach { case (tok, n, bs) =>
        val est = bs.zipWithIndex.map { case (b, r) =>
          grid.getOrElse((r.toLong, b), 0L) }.min
        assert(est >= n, s"CMS underestimated '$tok': $est < $n")
      }
    } finally q.stop()
  }

  test("streaming HLL registers: exact under re-delivery, estimate matches the oracle") {
    val t = tables
    val texts = t.documents.select($"text").as[String].collect().toSeq
    val (b1, b2) = texts.zipWithIndex.partition(_._2 % 2 == 0)
    val input = MemoryStream[String](spark)
    val q = SketchStream.hllRegisters(input.toDF().toDF("text"))
      .writeStream.format("memory").queryName("hllregs")
      .outputMode("complete").start()
    try {
      input.addData(b1.map(_._1): _*)
      q.processAllAvailable()
      input.addData(b2.map(_._1): _*)
      q.processAllAvailable()
      input.addData(b1.map(_._1): _*) // re-deliver ALL of batch 1
      q.processAllAvailable()
      val streamRegs = spark.table("hllregs")
        .as[(Long, Int)].collect().toMap
      // idempotent max: re-delivery cannot move a register — the final
      // table equals the batch registers over the set of rows
      val batchRegs = SketchStream.hllRegisters(texts.toDF("text"))
        .as[(Long, Int)].collect().toMap
      assert(streamRegs == batchRegs)
      assert(streamRegs.size <= 1024)
      // the batch estimator over the streaming-built registers
      // reproduces the oracled q_hll_audit estimate bit-for-bit
      val s40 = (0 until 1024).map(r =>
        1L << (40 - streamRegs.getOrElse(r.toLong, 0))).sum
      val est = math.floor(0.7213 / (1.0 + 1.079 / 1024.0) * 1048576.0 *
        1099511627776.0 / s40.toDouble).toLong
      val oracle = graft.operators.TextAnalysis.hllAudit(t)
        .select($"hll_est").as[Long].collect().head
      assert(est == oracle)
    } finally q.stop()
  }
}
