package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Round14Spec extends SparkSpec {

  test("bitextMineIvf: partial matching, pair-local cos bit-parity, recall vs dense") {
    val ivf = Similarity.bitextMineIvf(tables)
      .select("src_id", "tgt_id", "cos_ppm", "margin2k").collect()
    assert(ivf.nonEmpty)
    // mutual-best ⇒ a partial matching: each side appears at most once
    assert(ivf.map(_.getLong(0)).distinct.length == ivf.length)
    assert(ivf.map(_.getLong(1)).distinct.length == ivf.length)

    // pair-local cosine arithmetic is shared with the dense path —
    // replay cos_ppm by hand for every mined pair and demand equality
    val emb = tables.embeddings
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1000000d + 0.5d)))
      .toMap
    ivf.foreach { r =>
      val (s, t) = (r.getLong(0), r.getLong(1))
      val (mx, my) = (emb(s), emb(t))
      val dot = mx.zip(my).map { case (a, b) => a * b }.sum.toLong
      val aa = mx.map(a => a * a).sum.toLong
      val bb = my.map(b => b * b).sum.toLong
      val cos = math.floor(1000000.0 * dot.toDouble /
        (math.sqrt(aa.toDouble) * math.sqrt(bb.toDouble))).toLong
      assert(r.getLong(2) == cos, s"cos mismatch for ($s,$t)")
    }

    // the probe path recovers a healthy share of the dense mutual-best
    // pairs (deterministic here: no RNG anywhere in the build)
    val dense = Similarity.bitextMine(tables)
      .select("src_id", "tgt_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = ivf.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = got.intersect(dense).size.toDouble / dense.size
    info(s"bitextMineIvf recall vs dense: $recall (${got.size} mined, ${dense.size} dense)")
    assert(recall >= 0.3, s"recall collapsed: $recall")
  }

  test("regression: connectedComponents survives a cache-substitution miss (round-14 latent bug)") {
    // The pointer jump's broadcast side is a DeduplicateRelations COPY
    // of the sym fragment; Spark's CacheManager missed it for plans
    // like this one (range-rooted edges), recomputed sym RAW, and read
    // the round-0 label checkpoint AFTER the loop freed it —
    // CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND. sym is now an eager
    // localCheckpoint, making the miss harmless; this exact shape
    // crashed before the fix.
    val edges = spark.range(0, 1000).selectExpr("id as a", "(id % 97) as b")
    val cc = Components.connectedComponents(edges)
    // 97 joint components expected: a ≡ a mod 97 chains every residue class
    assert(cc.select("lbl").distinct().count() == 97)
    // and the same shape rooted in a CHILD session (the SuffixArray
    // loop-tuning path) resolves too
    val s2 = spark.newSession()
    val edges2 = s2.range(0, 500).selectExpr("id as a", "(id % 31) as b")
    assert(Components.connectedComponents(edges2)
      .select("lbl").distinct().count() == 31)
  }

  test("CDC chunking: a front insertion reslices exactly one chunk") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, base), (2L, "xxx " + base)).toDF("doc_id", "text")
    val ch = Curation.cdcChunkList(docs).collect()
      .groupBy(_.getLong(0)).map { case (id, rs) =>
        id -> rs.sortBy(_.getLong(1)).map(_.getString(2)).toSeq
      }
    val (a, b) = (ch(1L), ch(2L))
    assert(a.length > 2, s"need several chunks, got ${a.length}")
    // content-defined cuts depend only on local grams, so every chunk
    // of A after its first survives VERBATIM in B; only the first
    // chunk (which absorbed the inserted token) differs
    assert(b.length == a.length)
    assert(b.tail == a.tail)
    assert(b.head != a.head)
  }

  test("animated-GIF container: real frame extraction recovers exact per-frame colors") {
    val docs = tables.documents.limit(30)
    val gif = Multimodal.encodeGifMedia(docs, nFrames = 8)
    // the payload really is a GIF89a stream
    val first = gif.select("media").head.getAs[Array[Byte]](0)
    assert(new String(first.take(6), "US-ASCII") == "GIF89a")
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    val rows = Multimodal.frameExtract(gif, everyNth = 3).collect()
    assert(rows.length == 30 * 3) // frames 0, 3, 6 per doc
    rows.foreach { r =>
      val id = r.getLong(0)
      val i = r.getInt(1)
      assert(r.getInt(2) == 8) // the reader counted all container frames
      val h = md.digest(texts(id).getBytes("UTF-8"))
      val er = ((h(0) & 0xff) + 17 * i) % 256
      val eg = ((h(1) & 0xff) + 29 * i) % 256
      val eb = ((h(2) & 0xff) + 43 * i) % 256
      assert(math.round(r.getDouble(5) * 255d) == er, s"doc $id frame $i R")
      assert(math.round(r.getDouble(6) * 255d) == eg, s"doc $id frame $i G")
      assert(math.round(r.getDouble(7) * 255d) == eb, s"doc $id frame $i B")
      assert(r.getInt(3) == (id % 16 + 8).toInt && r.getInt(4) == (id % 12 + 6).toInt)
    }
  }

  test("WAV audio container: genuine RIFF bytes, exact sample stats recovered") {
    val docs = tables.documents.limit(30)
    val wav = Multimodal.encodeWavMedia(docs, nSamples = 512)
    val first = wav.select("media").head.getAs[Array[Byte]](0)
    assert(new String(first.take(4), "US-ASCII") == "RIFF")
    assert(new String(first.slice(8, 12), "US-ASCII") == "WAVE")
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    val rows = Multimodal.decodeAudioFeatures(wav).collect()
    assert(rows.length == 30 && rows.forall(_.getBoolean(1)))
    rows.foreach { r =>
      val h = md.digest(texts(r.getLong(0)).getBytes("UTF-8"))
      val seed = ((h(0) & 0xff) << 8) | (h(1) & 0xff)
      val step = (((h(2) & 0xff) << 8) | (h(3) & 0xff)) | 1
      val vs = (0 until 512).map(k => ((seed + k.toLong * step) % 65536) - 32768)
      assert(r.getLong(2) == 512 && r.getInt(3) == 8000)
      assert(r.getLong(4) == vs.map(math.abs).max)
      assert(r.getLong(5) == vs.map(v => v * v).sum)
      assert(r.getLong(6) == vs.count(_ >= 0))
    }
  }

  test("JPEG lossy decode: real DCT bytes decode within tolerance of source color") {
    val docs = tables.documents.limit(40)
    val j = Multimodal.encodeJpegMedia(docs)
    val meta = j.select("doc_id", "width", "height", "src_r", "src_g", "src_b")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getInt(3), r.getInt(4), r.getInt(5))).toMap
    // the payload really is a JFIF stream, not a re-labeled PNG
    val first = j.select("media").head.getAs[Array[Byte]](0)
    assert((first(0) & 0xff) == 0xff && (first(1) & 0xff) == 0xd8) // SOI marker
    val dec = Multimodal.decodeImageFeatures(j).collect()
    assert(dec.length == 40)
    dec.foreach { r =>
      val id = r.getLong(0)
      val (w, h, sr, sg, sb) = meta(id)
      assert(r.getBoolean(2), s"doc $id failed to decode")
      assert(r.getInt(3) == w.toInt && r.getInt(4) == h.toInt)
      // lossy: solid-color means land within a small band of the source
      assert(math.abs(r.getDouble(5) * 255d - sr) <= 8, s"doc $id R off")
      assert(math.abs(r.getDouble(6) * 255d - sg) <= 8, s"doc $id G off")
      assert(math.abs(r.getDouble(7) * 255d - sb) <= 8, s"doc $id B off")
    }
  }

  test("resize pixels: solid color survives the bilinear kernel (PNG and JPEG inputs)") {
    val docs = tables.documents.limit(20)
    // PNG (lossless source): resized solid color is EXACT
    val png = Multimodal.encodePngMedia(docs)
    val srcColor = png.select("doc_id", "src_r", "src_g", "src_b").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    val rp = Multimodal.decodeImageFeatures(
      Multimodal.resizeImage(png, maxSide = 20)).collect()
    rp.foreach { r =>
      val (sr, sg, sb) = srcColor(r.getLong(0))
      assert(r.getBoolean(2))
      assert(math.max(r.getInt(3), r.getInt(4)) <= 20)
      assert(math.round(r.getDouble(5) * 255d) == sr)
      assert(math.round(r.getDouble(6) * 255d) == sg)
      assert(math.round(r.getDouble(7) * 255d) == sb)
    }
    // JPEG (lossy source): resized output stays within the decode band
    val rj = Multimodal.decodeImageFeatures(
      Multimodal.resizeImage(Multimodal.encodeJpegMedia(docs), maxSide = 20)).collect()
    rj.foreach { r =>
      val (sr, sg, sb) = srcColor(r.getLong(0))
      assert(r.getBoolean(2))
      assert(math.abs(r.getDouble(5) * 255d - sr) <= 9)
      assert(math.abs(r.getDouble(6) * 255d - sg) <= 9)
      assert(math.abs(r.getDouble(7) * 255d - sb) <= 9)
    }
  }
}
