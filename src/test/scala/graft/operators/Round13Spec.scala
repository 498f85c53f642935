package graft.operators

import graft.SparkSpec
import graft.sources.BinaryIngest
import java.awt.image.BufferedImage
import javax.imageio.ImageIO
import org.apache.spark.sql.functions._

/** Round-13 pins: the multimodal kernel is REAL — actual PNG bytes
  * written by ImageIO flow through BinaryIngest's binaryFile scan and
  * the mapPartitions decode kernel, and decoded pixels are checked
  * against the source colors (PNG is lossless, so exactly). */
class Round13Spec extends SparkSpec {
  import spark.implicits._

  private def writePng(dir: java.nio.file.Path, name: String,
                       w: Int, h: Int, rgbAt: (Int, Int) => Int): Unit = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgbAt(x, y))
    ImageIO.write(img, "png", dir.resolve(name).toFile)
  }

  test("real PNG fixtures through binaryFile scan decode to exact pixel stats") {
    val dir = java.nio.file.Files.createTempDirectory("graft-png")
    // doc 0: solid red 10x8; doc 1: half black / half white 16x4
    writePng(dir, "0.png", 10, 8, (_, _) => 0xFF0000)
    writePng(dir, "1.png", 16, 4, (x, _) => if (x < 8) 0x000000 else 0xFFFFFF)
    // doc 2: not an image at all
    java.nio.file.Files.write(dir.resolve("2.png"), "not a png".getBytes)

    val media = BinaryIngest.binaryFiles(spark, dir.toString + "/*.png")
      .select(
        regexp_extract(col("path"), "(\\d+)\\.png$", 1).cast("long").as("doc_id"),
        col("content").as("media"))
    val r = Multimodal.decodeImageFeatures(media, bins = 5)
      .orderBy("doc_id").collect()

    assert(r.length == 3)
    val red = r(0)
    assert(red.getBoolean(2) && red.getInt(3) == 10 && red.getInt(4) == 8)
    assert(red.getDouble(5) == 1.0 && red.getDouble(6) == 0.0 && red.getDouble(7) == 0.0)
    // luma(red) = 299*255/1000 = 76 -> bin 76*5/256 = 1; all 80 pixels there
    assert(red.getSeq[Long](8) == Seq(0L, 80L, 0L, 0L, 0L))

    val bw = r(1)
    assert(bw.getBoolean(2) && bw.getInt(3) == 16 && bw.getInt(4) == 4)
    assert(bw.getDouble(5) == 0.5 && bw.getDouble(6) == 0.5 && bw.getDouble(7) == 0.5)
    assert(bw.getSeq[Long](8) == Seq(32L, 0L, 0L, 0L, 32L)) // black bin 0, white bin 4

    val bad = r(2)
    assert(!bad.getBoolean(2) && bad.isNullAt(3) && bad.isNullAt(8))
  }

  test("encodePngMedia produces genuine PNGs whose decode recovers the md5 color") {
    val docs = tables.documents.limit(8)
    val enc = Multimodal.encodePngMedia(docs).persist()
    // real PNG magic bytes on every payload
    enc.select("media").collect().foreach { row =>
      val b = row.getAs[Array[Byte]](0)
      assert((b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G')
    }
    val dec = Multimodal.decodeImageFeatures(enc, bins = 5)
      .join(enc.select(col("doc_id"), col("src_r"), col("src_g"), col("src_b"),
        col("width"), col("height")), Seq("doc_id"))
      .collect()
    assert(dec.nonEmpty)
    dec.foreach { row =>
      assert(row.getAs[Boolean]("decoded"))
      assert(row.getAs[Int]("img_width").toLong == row.getAs[Long]("width"))
      assert(row.getAs[Int]("img_height").toLong == row.getAs[Long]("height"))
      // lossless round-trip: channel mean of a solid image IS the source byte
      assert(row.getAs[Double]("mean_r") == row.getAs[Int]("src_r") / 255d)
      assert(row.getAs[Double]("mean_g") == row.getAs[Int]("src_g") / 255d)
      assert(row.getAs[Double]("mean_b") == row.getAs[Int]("src_b") / 255d)
    }
    enc.unpersist()
  }

  test("join-based tokenizer kernels are result-identical to the literal-map twins") {
    val docs = tables.documents
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    assert(rows(TextAnalysis.unigramEncodeJoinedDocs(docs)) ==
      rows(TextAnalysis.unigramEncodeDocs(docs)))
    assert(rows(TextAnalysis.wordpieceEncodeJoinedDocs(docs)) ==
      rows(TextAnalysis.wordpieceEncodeDocs(docs)))
    // padding the vocabulary with never-matching pieces changes nothing
    assert(rows(TextAnalysis.unigramEncodeJoinedDocs(docs, padTo = 512)) ==
      rows(TextAnalysis.unigramEncodeDocs(docs)))
    assert(rows(TextAnalysis.wordpieceEncodeJoinedDocs(docs, padTo = 512)) ==
      rows(TextAnalysis.wordpieceEncodeDocs(docs)))
  }

  test("htmlExtract: nav/footer/linked paragraphs drop, prose survives") {
    // doc 0, 20 words: chunk 0 is (0+0)%4==0 -> fully linked (boiler);
    // chunk 1 plain prose (content). Plus nav (2 words, all linked),
    // script (stripped), footer (1 word, linked).
    val words = (1 to 20).map(i => s"w$i").mkString(" ")
    val docs = Seq((0L, words)).toDF("doc_id", "text")
    val r = Curation.htmlExtractDocs(docs).collect()(0)
    assert(r.getAs[Long]("n_lines") == 4)     // nav, p0, p1, footer
    assert(r.getAs[Long]("n_content") == 1)   // p1 only
    assert(r.getAs[Long]("n_boiler") == 3)
    assert(r.getAs[Long]("content_words") == 10)
    assert(r.getAs[Long]("link_words") == 13) // nav 2 + p0 10 + footer 1
    // the surviving text is exactly chunk 1's words
    val expected = (11 to 20).map(i => s"w$i").mkString(" ")
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(expected.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r.getAs[String]("content_hash") == hex)
  }

  test("bitextMine: mutual-best is a partial matching; margins decompose") {
    val r = Similarity.bitextMine(tables).collect()
    assert(r.nonEmpty)
    // forward ∩ backward can use each src and each tgt at most once
    assert(r.map(_.getLong(0)).distinct.length == r.length)
    assert(r.map(_.getLong(1)).distinct.length == r.length)
    // distance margin is bounded: 2k·cos − Σk best ≤ k·(cos − worst)
    r.foreach { row =>
      val (cos, margin) = (row.getLong(2), row.getLong(3))
      assert(margin <= 8L * cos - 8L * (-1000000L)) // cos_ppm ≥ −10⁶ each side
    }
  }

  test("distinctNgrams: repetition drives the ratio, diversity saturates it") {
    val docs = Seq((0L, "a a a a"), (1L, "a b c d")).toDF("doc_id", "text")
    val r = TextAnalysis.distinctNgramsDocs(docs).collect()
    assert(r(0).getLong(1) == 3 && r(0).getLong(2) == 1) // n2=3 u2=1
    assert(r(0).getLong(3) == 333333L)
    assert(r(1).getLong(3) == 1000000L && r(1).getLong(6) == 1000000L)
  }

  test("labelPropagation matches a hand-rolled synchronous LPA replay") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("a", "b")
    val got = Components.labelPropagation(edges, rounds = 3)
      .select("node", "lbl").as[(Long, Long)].collect().toMap
    // JVM replay: same sync update, same (count desc, lbl asc) tie rule
    val sym = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 4L),
      (4L, 3L), (10L, 11L), (11L, 10L))
    var lbl = sym.map(_._1).distinct.map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      lbl = sym.groupBy(_._1).map { case (n, es) =>
        val counts = es.map(e => lbl(e._2)).groupBy(identity)
          .map { case (l, xs) => (l, xs.size) }
        n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    assert(got == lbl)
    // community_size is exactly the number of nodes sharing the label
    val rows = Components.labelPropagation(edges, rounds = 3)
      .select("node", "lbl", "community_size")
      .as[(Long, Long, Long)].collect()
    val byLbl = rows.groupBy(_._2).map { case (l, xs) => (l, xs.length.toLong) }
    rows.foreach { case (_, l, cs) => assert(cs == byLbl(l)) }
  }

  test("zipfAudit: octave structure is sound") {
    val r = TextAnalysis.zipfAudit(tables).collect()
    assert(r.nonEmpty)
    // octave b holds at most 2^(b-1) ranks
    r.foreach { row =>
      val (oct, nTypes) = (row.getLong(0), row.getLong(1))
      assert(nTypes <= (1L << (oct - 1).toInt))
    }
    // first octave is rank 1 only; ratios defined from the second on
    assert(r.head.getLong(0) == 1 && r.head.getLong(1) == 1)
    assert(r.head.isNullAt(4) && r.tail.forall(!_.isNullAt(4)))
  }

  test("suffixArray: prefix doubling matches the brute-force suffix sort") {
    val docs = Seq(
      (0L, "banana"), (1L, "bandana"), (2L, "a"), (3L, "")
    ).toDF("doc_id", "text")
    val got = SuffixArray.suffixArray(docs)
      .select("sa_pos", "doc_id", "off").as[(Long, Long, Long)]
      .collect().sortBy(_._1).map(r => (r._2, r._3)).toSeq
    // brute force: every (doc, off) suffix, plain lexicographic sort
    // with shorter-prefix-first (exactly String.compareTo), doc_id/off
    // ties impossible (suffixes within a doc are distinct; across docs
    // equal suffixes CAN tie — break by (suffix, doc, off) like the
    // dense-rank's deterministic group order)
    val brute = Seq((0L, "banana"), (1L, "bandana"), (2L, "a"))
      .flatMap { case (id, t) =>
        (1 to t.length).map(o => (t.substring(o - 1), id, o.toLong)) }
      .sorted.map(s => (s._2, s._3))
    // equal suffixes share a rank -> positions of equal suffixes can
    // come back in either order within their tie; compare the SORTED
    // suffix STRINGS instead of positions
    def str(seq: Seq[(Long, Long)]): Seq[String] = {
      val texts = Map(0L -> "banana", 1L -> "bandana", 2L -> "a")
      seq.map { case (d, o) => texts(d).substring(o.toInt - 1) }
    }
    assert(str(got) == str(brute.map(x => (x._1, x._2))))
  }

  test("session_window twin matches the typed kernel's pure fold") {
    import graft.streaming.SessionStream
    val gap = 30 * 60000L
    val ev = tables.events.filter(col("user_id") < 20)
      .select("user_id", "ts", "event_id")
      .as[(Long, java.sql.Timestamp, Long)].collect()
    val expected = ev.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e._2.getTime, e._3))
        .map(e => SessionStream.Ev(u, e._2, e._3)).toSeq
      // advance merges at diff <= its gap; session_window merges at
      // diff < gap — align exactly with gap-1ms (ms-resolution data)
      val (closed, open) = SessionStream.advance(None, sorted, gap - 1)
      (closed ++ open).map(s => (u, s.start, s.end + gap, s.n))
    }.toSet
    val got = graft.streaming.EventStreams
      .sessionWindowCounts(tables.events.filter(col("user_id") < 20))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getTimestamp(2).getTime, r.getLong(3))).toSet
    assert(got == expected && got.nonEmpty)
  }

  test("NfcNormalize: native expression composes combining marks in codegen") {
    import graft.functions.TextFunctions.nfcNormalize
    val df = Seq(
      ("café", "café"),   // e + combining acute -> é
      ("zürich", "zürich"),
      ("plain ascii", "plain ascii")
    ).toDF("raw", "expected")
    val r = df.select(nfcNormalize(col("raw")).as("nfc"), col("expected"))
      .collect()
    r.foreach(row => assert(row.getString(0) == row.getString(1)))
    // the expression stays inside whole-stage codegen (assert over a
    // parquet scan — a local Seq collapses to LocalTableScan)
    val plan = tables.documents.select(nfcNormalize(col("text")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_nfc"), plan) // * = codegen stage
    // null-safe
    assert(Seq((null: String, 0)).toDF("raw", "x")
      .select(nfcNormalize(col("raw"))).head.isNullAt(0))
  }

  test("saDedup: clusters are consistent and survivors are cluster minima") {
    val rows = SuffixArray.saDedup(tables)
      .select("doc_id", "cluster_id", "survivor")
      .as[(Long, Long, Int)].collect()
    assert(rows.nonEmpty)
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (cid, xs) =>
      assert(xs.map(_._1).min == cid)        // label = min member id
      assert(xs.count(_._3 == 1) == 1)       // exactly one survivor
      assert(xs.find(_._3 == 1).get._1 == cid)
    }
    // every sliced doc appears exactly once
    assert(rows.map(_._1).distinct.length == rows.length)
  }

  test("realMediaFeatures: oracle-shape columns match the md5-replay by hand") {
    val r = Multimodal.realMediaFeatures(tables, bins = 5)
      .filter(col("doc_id") < 5).collect()
    assert(r.length == 5)
    val md = java.security.MessageDigest.getInstance("MD5")
    val texts = tables.documents.filter(col("doc_id") < 5)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    r.foreach { row =>
      val id = row.getLong(0)
      val h = md.digest(texts(id).getBytes("UTF-8"))
      val (cr, cg, cb) = (h(0) & 0xff, h(1) & 0xff, h(2) & 0xff)
      assert(row.getInt(1) == 1) // decoded
      assert(row.getLong(4) == math.floor(cr / 255d * 1000000d + 0.5d).toLong)
      assert(row.getLong(5) == math.floor(cg / 255d * 1000000d + 0.5d).toLong)
      assert(row.getLong(6) == math.floor(cb / 255d * 1000000d + 0.5d).toLong)
      assert(row.getInt(7) == ((cr * 299 + cg * 587 + cb * 114) / 1000 * 5) / 256)
    }
  }
}
