package graft.operators

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof join picks latest right row at-or-before left time, per key") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "p1"),
      (1L, ts("2024-01-01 12:00:00"), "p2"),
      (2L, ts("2024-01-01 09:00:00"), "p3") // no click before -> null
    ).toDF("user_id", "p_ts", "p")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), "c1"),
      (1L, ts("2024-01-01 11:59:00"), "c2"),
      (1L, ts("2024-01-01 13:00:00"), "c3"), // after everything
      (2L, ts("2024-01-01 09:30:00"), "c4")
    ).toDF("user_id", "c_ts", "c")
    val r = AsOfJoin.asofJoin(left, right, Seq("user_id"), "p_ts", "c_ts")
      .select("p", "c").as[(String, Option[String])].collect().toMap
    assert(r == Map("p1" -> Some("c1"), "p2" -> Some("c2"), "p3" -> None))
  }

  test("same-instant right row matches (>= semantics)") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "p")).toDF("user_id", "p_ts", "p")
    val right = Seq((1L, ts("2024-01-01 10:00:00"), "c")).toDF("user_id", "c_ts", "c")
    val r = AsOfJoin.asofJoin(left, right, Seq("user_id"), "p_ts", "c_ts")
      .select("c").as[Option[String]].head()
    assert(r.contains("c"))
  }
}

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("gap > 30min starts a new session") {
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L),
      (1L, Timestamp.valueOf("2024-01-01 10:10:00"), 2L),
      (1L, Timestamp.valueOf("2024-01-01 11:00:00"), 3L), // 50min gap -> new
      (2L, Timestamp.valueOf("2024-01-01 10:00:00"), 4L)
    ).toDF("user_id", "ts", "event_id")
    val r = Sessionize.sessions(ev)
      .select("user_id", "session_idx", "n_events")
      .as[(Long, Long, Long)].collect().toSet
    assert(r == Set((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }
}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "spark catalyst optimizes declarative plans into distributed executions across many partitions and executors with codegen"

  test("minhash LSH finds planted near-duplicates, skips unrelated docs") {
    val docs = Seq(
      (1L, base),
      (2L, base.replace("codegen", "vectorization")), // near-dup of 1
      (3L, "entirely different content about zip archives and geometry rings with areas"),
      (4L, base) // exact dup of 1
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(docs, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L)))
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("exact dedup groups identical texts under min-id survivor") {
    val docs = Seq((10L, "aaa"), (11L, "aaa"), (12L, "bbb")).toDF("doc_id", "text")
    val r = docs.groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("survivor"), count(lit(1)).as("n"))
      .select("survivor", "n").as[(Long, Long)].collect().toSet
    assert(r == Set((10L, 2L), (12L, 1L)))
  }

  test("near-dup survivors drop transitive chains, keep unrelated docs") {
    // 1~2 and 2~4 are near-dups; 1~4 exact; 3 unrelated. The whole
    // {1,2,4} chain must collapse to its min id even if some pair was
    // only reachable transitively.
    val docs = Seq(
      (1L, base),
      (2L, base.replace("codegen", "vectorization")),
      (3L, "entirely different content about zip archives and geometry rings with areas"),
      (4L, base)
    ).toDF("doc_id", "text")
    val kept = Dedup.nearDupSurvivors(docs, threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(1L) && kept.contains(3L))
    assert(!kept.contains(4L)) // exact dup always collapses
    assert(kept.size < 4) // at least one of the near-dups dropped
  }

  test("simhash pairs find the exact duplicate at hamming 0") {
    val docs = Seq(
      (1L, base), (2L, base),
      (3L, "other words entirely unrelated to anything above in this suite")
    ).toDF("doc_id", "text")
    val r = Dedup.simhashPairs(docs).select("doc_a", "doc_b", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    assert(r.contains((1L, 2L, 0L)))
    assert(!r.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("md5-hash minhash variant (the oracled instance) finds the same planted dups") {
    val docs = Seq(
      (1L, base),
      (2L, base.replace("codegen", "vectorization")),
      (3L, "entirely different content about zip archives and geometry rings with areas"),
      (4L, base)
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(docs, threshold = 0.5,
        shingleHash = Dedup.md5Hash31, bandKeyOf = Dedup.bandKeysStr)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("md5 simhash: chunk-bucketed pairs equal brute-force hamming (pigeonhole)") {
    val docs = Seq(
      (1L, base), (2L, base), (3L, base.replace("codegen", "vectorization")),
      (4L, "other words entirely unrelated to anything above in this suite"),
      (5L, "more filler prose that shares nothing with the planted near dup cluster")
    ).toDF("doc_id", "text")
    val fp = Dedup.simhashMd5Fingerprints(docs).as[(Long, Long)].collect().toMap
    val brute = (for {
      a <- fp.keys; b <- fp.keys if a < b
      h = java.lang.Long.bitCount(fp(a) ^ fp(b)) if h <= 3
    } yield (a, b, h.toLong)).toSet
    val bucketed = Dedup.simhashPairsMd5(docs)
      .as[(Long, Long, Long)].collect().toSet
    assert(bucketed == brute)
    assert(brute.contains((1L, 2L, 0L))) // planted exact dup
  }

  test("ngramJaccard bucketed window plans a hash join, not a nested loop") {
    val qe = Dedup.ngramJaccard(tables).queryExecution
    val plan = qe.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"expected equi-join on the DIV-5 bucket, got:\n$plan")
  }
}

class MinhashEstimationSpec extends SparkSpec {
  import spark.implicits._

  test("signature slot-agreement estimates true Jaccard") {
    // two docs sharing exactly half their shingle vocabulary
    val shared = (1 to 40).map(i => s"s$i w$i x$i")
    val a = shared ++ (1 to 40).map(i => s"a$i b$i c$i")
    val b = shared ++ (1 to 40).map(i => s"d$i e$i f$i")
    val docs = Seq((1L, a.mkString(" ")), (2L, b.mkString(" "))).toDF("doc_id", "text")
    val numPerm = 64
    val sh = Dedup.shingled(docs, 3)
    val sigs = Dedup.minhashSignatures(sh, numPerm)
      .orderBy("doc_id").select("sig").as[Seq[Long]].collect()
    val agree = sigs(0).zip(sigs(1)).count { case (x, y) => x == y }.toDouble / numPerm
    // true jaccard of the shingle sets
    val sets = sh.orderBy("doc_id").select("sh").as[Seq[String]].collect().map(_.toSet)
    val j = (sets(0) intersect sets(1)).size.toDouble / (sets(0) union sets(1)).size
    assert(math.abs(agree - j) < 0.2, s"estimate=$agree true=$j")
    assert(j > 0.2 && j < 0.8) // the construction actually produced partial overlap
  }
}

class EmbedDedupSpec extends SparkSpec {
  import spark.implicits._

  test("hyperplane LSH finds identical/near-identical vectors, verifies by cosine") {
    val rnd = new scala.util.Random(7)
    def vec() = Array.fill(64)(rnd.nextGaussian().toFloat)
    val v1 = vec()
    val v1b = v1.map(x => x * 1.001f) // same direction -> cosine ~1
    val rows = Seq((1L, v1), (2L, v1b)) ++ (3L to 40L).map(i => (i, vec()))
    val emb = rows.toDF("vec_id", "embedding")
    val pairs = Dedup.embedPairs(emb, threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }

  test("multi-probe LSH recall vs brute force at the default threshold; precision exact") {
    val emb = graft.sources.Tables(spark, "/root/testdata/sf0.01").embeddings
    val v = org.apache.spark.sql.functions.transform(col("embedding"), _.cast("double"))
    val d = emb.select(col("vec_id"), v.as("v"))
    val brute = d.select(col("vec_id").as("id_a"), col("v").as("va"))
      .join(d.select(col("vec_id").as("id_b"), col("v").as("vb")), col("id_a") < col("id_b"))
      .filter(graft.operators.Similarity.cosine(col("va"), col("vb")) >= 0.35)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.embedPairs(emb)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // verify step recomputes exact cosine -> no false positives, ever
    assert((lsh diff brute).isEmpty, s"false positives: ${(lsh diff brute).take(5)}")
    val recall = (lsh intersect brute).size.toDouble / math.max(1, brute.size)
    // corpus-scaled bits + Hamming-1 multi-probe: ~0.99 expected at
    // n=500/bits=4; the bound leaves room for unlucky hyperplanes
    assert(recall >= 0.7, s"recall $recall over ${brute.size} true pairs")
  }

  test("md5Planes are ±1, deterministic, and match DuckDB's md5-hex parity rule") {
    val p = Dedup.md5Planes(2, 3, 8)
    assert(p.flatten.flatten.forall(v => v == 1.0 || v == -1.0))
    assert(Dedup.md5Planes(2, 3, 8).flatten.flatten.toSeq == p.flatten.flatten.toSeq)
    // spot-check one cell against an independent md5 computation of the
    // exact string DuckDB hashes: "0_0_1" (table 0, plane 0, dim 1)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("0_0_1".getBytes("UTF-8"))
    val h = java.lang.Long.parseLong(md.take(4).map(b => f"$b%02x").mkString, 16)
    assert(p(0)(0)(0) == (if (h % 2 == 0) 1.0 else -1.0))
  }

  test("oracled md5 LSH: exact pairs in, no false positives, sign kernel integer-exact") {
    val rnd = new scala.util.Random(11)
    def vec() = Array.fill(64)(rnd.nextGaussian().toFloat)
    val v1 = vec()
    val v1b = v1.map(x => x * 1.5f) // same direction -> identical sketch, cos 1
    val rows = Seq((1L, v1), (2L, v1b)) ++ (3L to 40L).map(i => (i, vec()))
    val emb = rows.toDF("vec_id", "embedding")
    val got = Dedup.embedPairsMd5(emb, thresholdPpm = 900000L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 2L)), s"scaled copy must share every bucket; got $got")
    // verify step is exact: nothing below the ppm threshold survives
    val all = Dedup.embedPairsMd5(emb, thresholdPpm = 900000L)
      .select("cos_ppm").as[Long].collect()
    assert(all.forall(_ >= 900000L))
  }

  test("annRecall: identical-direction pair always found; recall never exceeds 1") {
    val rnd = new scala.util.Random(13)
    def vec() = Array.fill(64)(rnd.nextGaussian().toFloat)
    val v1 = vec()
    val rows = Seq((1L, v1), (2L, v1.map(_ * 2.0f))) ++ (3L to 30L).map(i => (i, vec()))
    val dir = java.nio.file.Files.createTempDirectory("graft-ann").toString
    rows.toDF("vec_id", "embedding").write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val t = graft.sources.Tables(spark, dir)
    val r = Dedup.annRecall(t, samplePpm = 1000000L) // audit every vector
      .select("band", "n_true", "n_found", "recall_ppm")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // the micro-int snap floors the scaled copy's cos_ppm to 999999 ->
    // band 9 (band 10 needs exactly-collinear integer vectors)
    val top = r.find(_._1 >= 9L).getOrElse(fail(s"no cos~1.0 band in $r"))
    assert(top._2 >= 1L && top._3 == top._2, s"scaled copy shares every bucket: $r")
    assert(r.forall { case (_, t2, f, ppm) => f <= t2 && ppm <= 1000000L })
  }
}

class SpreadSpec extends SparkSpec {
  import spark.implicits._

  test("spread fans an under-parallel input out to all cores") {
    val one = (1 to 100).toDF("x").coalesce(1)
    assert(Dedup.spread(one).rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
  }

  test("spread is the identity on an already-parallel input (no round-robin shuffle)") {
    val par = spark.sparkContext.defaultParallelism
    val wide = (1 to 100).toDF("x").repartition(par * 2, col("x"))
    val spreaded = Dedup.spread(wide)
    assert(spreaded eq wide) // literally the same frame: zero plan change
    // and through a real pipeline: no RoundRobinPartitioning exchange
    val docs = (1 to 64).map(i => (i.toLong, s"alpha beta gamma delta $i"))
      .toDF("doc_id", "text").repartition(par * 2, col("doc_id"))
    val plan = Dedup.shingled(docs, 2).queryExecution.executedPlan.toString
    assert(!plan.contains("RoundRobinPartitioning"), s"unexpected round-robin:\n$plan")
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("brute-force knn ranks by cosine with exact math on axis vectors") {
    val corpus = Seq(
      (0L, Array(1f, 0f, 0f)),
      (1L, Array(0.9f, 0.1f, 0f)),
      (2L, Array(0f, 1f, 0f)),
      (3L, Array(-1f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val q = corpus.filter(col("vec_id") === 0L)
    val r = Similarity.bruteKnn(corpus, q, 3)
      .select("rank", "neighbor_id").as[(Long, Long)].collect().sorted
    assert(r.head == ((1L, 1L)))          // most similar
    assert(r.last == ((3L, 3L)))          // opposite vector ranks last
  }

  test("IVF Lloyd loop frees prior rounds' caches: storage is O(1) in iters") {
    spark.catalog.clearCache()
    // clearCache misses localCheckpoint RDD blocks leaked by OTHER
    // suites' eager query construction (the Bench cleanup rule) —
    // without this the count below is cross-suite order-dependent
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    val (_, cents) = Similarity.ivfAssign(tables.embeddings, nlist = 16, iters = 4)
    cents.count()
    // hold only base + final assigned + final cents, regardless of iters
    val n = spark.sparkContext.getPersistentRDDs.size
    assert(n <= 3, s"expected <=3 persisted frames after 4 Lloyd rounds, got $n")
    spark.catalog.clearCache()
  }

  test("IVF knn achieves reasonable recall vs brute force on real table") {
    val emb = tables.embeddings
    val queries = emb.filter(col("vec_id") < 5)
    val brute = Similarity.bruteKnn(emb, queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfKnn(emb, queries, 5, nlist = 8, nprobe = 4, iters = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall >= 0.4, s"recall $recall")
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("real resize: aspect preserved, small media pass through byte-identical") {
    val m = Multimodal.encodePngMedia(tables.documents.limit(40))
    val srcBytes = m.select("doc_id", "media").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val r = Multimodal.resizeImage(m, maxSide = 32).collect()
    assert(r.length == 40)
    r.foreach { row =>
      val id = row.getLong(0)
      val (w, h) = ((id % 64 + 16).toInt, (id % 48 + 12).toInt)
      val (ow, oh) = (row.getInt(2), row.getInt(3))
      if (math.max(w, h) <= 32) {
        assert(!row.getBoolean(4) && (ow, oh) == ((w, h)))
        assert(row.getAs[Array[Byte]](1).sameElements(srcBytes(id)))
      } else {
        val scale = 32.0 / math.max(w, h)
        assert(row.getBoolean(4) && math.max(ow, oh) == 32)
        if (w >= h) assert(ow == 32 && oh == math.max(1, math.round(h * scale).toInt))
        else assert(oh == 32 && ow == math.max(1, math.round(w * scale).toInt))
      }
    }
  }

  test("frame sampling explodes deterministic per-frame rows") {
    val m = Multimodal.withFakeMedia(tables.documents.limit(5))
    val f = Multimodal.frameSample(m, nFrames = 120, everyNth = 30)
    val idx = f.filter(col("doc_id") === 0).select("frame_idx")
      .as[Long].collect().sorted.toSeq
    assert(idx == Seq(0L, 30L, 60L, 90L))
    val a = f.orderBy("doc_id", "frame_idx").select("frame").head.getAs[Array[Byte]](0)
    val b = f.orderBy("doc_id", "frame_idx").select("frame").head.getAs[Array[Byte]](0)
    assert(a.sameElements(b) && a.length == 16)
  }

  test("media plumbing: binary payloads with typed metadata, decoded per partition") {
    val feats = Multimodal.decodeFeatures(
      Multimodal.withFakeMedia(tables.documents), dim = 8)
    val r = feats.select("n_bytes", "feature_dim").distinct()
      .as[(Long, Int)].collect().toSet
    assert(r == Set((16L, 8)))           // md5 -> 16 bytes, 8 features
    val f = feats.select("features").head.getSeq[Float](0)
    assert(f.forall(v => v >= 0f && v <= 1f))
    // deterministic across runs
    val a = feats.orderBy("doc_id").select("features").head.getSeq[Float](0)
    val b = feats.orderBy("doc_id").select("features").head.getSeq[Float](0)
    assert(a == b)
  }
}
