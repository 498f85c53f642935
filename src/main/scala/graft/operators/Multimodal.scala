package graft.operators

import graft.CacheRegistry.Tracked
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video travel as opaque
  * `binary` columns with typed metadata; decode / feature-extraction
  * runs in `mapPartitions` so a real decoder would amortize model/
  * codec init once per partition (the batch-shaped UDF pattern).
  *
  * Two kernel tiers share the plan shape:
  *   - [[decodeFeatures]] — the deterministic byte-derived STUB, kept
  *     as the cross-engine oracle twin for the hash-payload path;
  *   - [[encodePngMedia]] / [[decodeImageFeatures]] — a REAL codec
  *     round-trip on `javax.imageio` (pure JVM, offline, zero new
  *     dependencies): PNG bytes are written and parsed by the actual
  *     ImageIO codec, and because PNG is lossless the decoded pixel
  *     statistics are still an exact integer function of the source
  *     color — which is what lets [[realMediaFeatures]] stay fully
  *     DuckDB-oracled even though real compressed bytes flow through
  *     the plan (the reference's own binary decode is st_read on zipped
  *     shapefiles, crowdsorsa-etl-2023.R:32 — same contract: opaque
  *     bytes in, typed columns out, decode inside the executor task).
  */
object Multimodal {

  /** Attach a deterministic fake media payload + metadata to documents:
    * media = md5(text) bytes, dimensions derived from doc_id. Stands in
    * for reading a real object-store column. */
  def withFakeMedia(docs: DataFrame): DataFrame =
    Dedup.spread(docs).select(
      col("doc_id"),
      unhex(md5(col("text"))).as("media"),
      lit("image/fake").as("format"),
      (col("doc_id") % 64 + 16).cast("long").as("width"),
      (col("doc_id") % 48 + 12).cast("long").as("height"))

  private val featSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", LongType),
    StructField("feature_dim", IntegerType),
    StructField("features", ArrayType(FloatType, containsNull = false))))

  /** STUB decoder: a real implementation would decode `media` and run a
    * feature extractor per batch; this derives `dim` floats from the
    * bytes deterministically. Partition-wise, like a real codec. */
  def decodeFeatures(media: DataFrame, dim: Int = 8): DataFrame = {
    val enc = Encoders.row(featSchema)
    media.select(col("doc_id"), col("media"))
      .mapPartitions { rows =>
        // per-partition init would go here (codec/model handle)
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val feats = Array.tabulate(dim) { i =>
            // deterministic byte-derived stand-in; the REAL codec
            // kernel is decodeImageFeatures (same plan shape)
            (bytes(i % bytes.length) & 0xff).toFloat / 255f
          }
          Row(id, bytes.length.toLong, dim, feats)
        }
      }(enc)
  }

  // ——— REAL codec path (javax.imageio) ———

  private val pngSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media", BinaryType),
    StructField("format", StringType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("src_r", IntegerType),
    StructField("src_g", IntegerType),
    StructField("src_b", IntegerType)))

  /** Attach a REAL PNG payload per document: a solid-color image whose
    * RGB is the first three md5(text) bytes and whose dimensions derive
    * from doc_id (same dims convention as [[withFakeMedia]]), encoded
    * by the actual ImageIO PNG writer inside mapPartitions. The bytes
    * are a genuine zlib-compressed PNG stream — only the PIXELS are
    * deterministic, which is all the lossless decode contract needs. */
  def encodePngMedia(docs: DataFrame): DataFrame = {
    val enc = Encoders.row(pngSchema)
    // spread BEFORE the codec kernel: a single-row-group scan would
    // run the per-row encoder on 1-2 tasks (measured: the 10x corpus,
    // written as 32 files, decoded FASTER than 1x before this)
    Dedup.spread(docs.select(col("doc_id"), unhex(md5(col("text"))).as("h")))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false) // codec init, once per partition
        rows.map { row =>
          val id = row.getLong(0)
          val h = row.getAs[Array[Byte]](1)
          val (r, g, b) = (h(0) & 0xff, h(1) & 0xff, h(2) & 0xff)
          val w = (id % 64 + 16).toInt
          val ht = (id % 48 + 12).toInt
          val img = new java.awt.image.BufferedImage(
            w, ht, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val rgb = (r << 16) | (g << 8) | b
          var y = 0
          while (y < ht) {
            var x = 0
            while (x < w) { img.setRGB(x, y, rgb); x += 1 }
            y += 1
          }
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", out)
          Row(id, out.toByteArray, "image/png", w.toLong, ht.toLong, r, g, b)
        }
      }(enc)
  }

  private val imgSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", LongType),
    StructField("decoded", BooleanType),
    StructField("img_width", IntegerType),
    StructField("img_height", IntegerType),
    StructField("mean_r", DoubleType),
    StructField("mean_g", DoubleType),
    StructField("mean_b", DoubleType),
    StructField("luma_hist", ArrayType(LongType, containsNull = false))))

  /** REAL image decode: `javax.imageio.ImageIO.read` parses the binary
    * payload (PNG/BMP/GIF/JPEG — whatever the JVM's registered codecs
    * accept) inside the same mapPartitions kernel shape as the stub.
    * Per row: decoded dimensions, per-channel means in [0,1], and a
    * `bins`-bucket ITU-R 601 luma histogram (integer luma, exact).
    * Undecodable payloads come back with decoded=false and null stats —
    * the curation-filter input, never an exception on a 100 TB scan
    * where some fraction of blobs is always corrupt. */
  def decodeImageFeatures(media: DataFrame, bins: Int = 5): DataFrame = {
    val enc = Encoders.row(imgSchema)
    media.select(col("doc_id"), col("media"))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false) // no temp-file cache in executor tasks
        rows.map { row =>
          val id = row.getLong(0)
          val bytes = row.getAs[Array[Byte]](1)
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: Exception => null }
          if (img == null) Row(id, bytes.length.toLong, false, null, null, null, null, null, null)
          else {
            val w = img.getWidth
            val h = img.getHeight
            val hist = new Array[Long](bins)
            var sr = 0L; var sg = 0L; var sb = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val p = img.getRGB(x, y)
                val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
                sr += r; sg += g; sb += b
                hist(((r * 299 + g * 587 + b * 114) / 1000 * bins) / 256) += 1L
                x += 1
              }
              y += 1
            }
            val n = w.toLong * h
            // channel mean: integer sum ÷ count ÷ 255 in pure doubles —
            // for the oracled solid-color instance sr/n is EXACT, so the
            // whole chain replays in DuckDB double arithmetic bit-for-bit
            Row(id, bytes.length.toLong, true, w, h,
              sr.toDouble / n / 255d, sg.toDouble / n / 255d, sb.toDouble / n / 255d,
              hist)
          }
        }
      }(enc)
  }

  /** End-to-end REAL codec round-trip, fully oracled: documents →
    * ImageIO PNG encode → ImageIO decode → pixel statistics. PNG is
    * lossless, so decoded means/luma are exact integer functions of the
    * md5-derived source color; micro-snapping the means and taking the
    * modal luma bin makes every output column a pure integer/double
    * expression DuckDB replays without ever seeing the compressed
    * bytes. n_bytes is intentionally NOT exposed — the zlib stream
    * length is codec-version-dependent; the plumbing asserts it via
    * decoded=true instead. */
  def realMediaFeatures(t: Tables, bins: Int = 5): DataFrame = {
    val dec = decodeImageFeatures(encodePngMedia(t.documents), bins)
    dec.select(
        col("doc_id"),
        col("decoded").cast("int").as("decoded"), // int: no boolean oracle-hash precedent
        col("img_width"), col("img_height"),
        floor(col("mean_r") * 1000000d + 0.5d).cast("long").as("mean_r_micro"),
        floor(col("mean_g") * 1000000d + 0.5d).cast("long").as("mean_g_micro"),
        floor(col("mean_b") * 1000000d + 0.5d).cast("long").as("mean_b_micro"),
        expr(s"""filter(transform(luma_hist, (c, i) -> IF(c = array_max(luma_hist), i, -1)),
                        i -> i >= 0)[0]""").cast("int").as("luma_mode_bin"))
      .orderBy(col("doc_id"))
  }

  /** Attach a REAL JPEG payload per document — [[encodePngMedia]]'s
    * lossy-codec sibling, the common web-corpus case: same md5-derived
    * solid color and doc_id dims, encoded by the actual ImageIO JPEG
    * writer (JFIF + DCT + chroma subsampling). LOSSY, so decoded pixel
    * stats only approximate the source color — the rows-only spec
    * asserts a tolerance band while the PNG path stays the oracled
    * route. */
  def encodeJpegMedia(docs: DataFrame): DataFrame = {
    val enc = Encoders.row(pngSchema)
    Dedup.spread(docs.select(col("doc_id"), unhex(md5(col("text"))).as("h")))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { row =>
          val id = row.getLong(0)
          val h = row.getAs[Array[Byte]](1)
          val (r, g, b) = (h(0) & 0xff, h(1) & 0xff, h(2) & 0xff)
          val w = (id % 64 + 16).toInt
          val ht = (id % 48 + 12).toInt
          val img = new java.awt.image.BufferedImage(
            w, ht, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val rgb = (r << 16) | (g << 8) | b
          var y = 0
          while (y < ht) {
            var x = 0
            while (x < w) { img.setRGB(x, y, rgb); x += 1 }
            y += 1
          }
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "jpg", out)
          Row(id, out.toByteArray, "image/jpeg", w.toLong, ht.toLong, r, g, b)
        }
      }(enc)
  }

  private val resizedSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media", BinaryType),
    StructField("out_width", IntegerType),
    StructField("out_height", IntegerType),
    StructField("resized", BooleanType)))

  /** REAL aspect-preserving resize (replaces the former resizeStub):
    * decode via ImageIO, scale so max(w, h) == maxSide with a bilinear
    * Graphics2D draw, re-encode PNG — all inside the one-pass
    * mapPartitions kernel shape, codec init amortized per partition.
    * Images already within bounds pass through byte-identical
    * (resized=false, original dims); undecodable payloads pass through
    * with null dims — a 100 TB scan filters, never throws. */
  def resizeImage(media: DataFrame, maxSide: Int): DataFrame = {
    val enc = Encoders.row(resizedSchema)
    media.select(col("doc_id"), col("media"))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { row =>
          val id = row.getLong(0)
          val bytes = row.getAs[Array[Byte]](1)
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: Exception => null }
          if (img == null) Row(id, bytes, null, null, false)
          else {
            val w = img.getWidth
            val h = img.getHeight
            val side = math.max(w, h)
            if (side <= maxSide) Row(id, bytes, w, h, false)
            else {
              // pin the LONG side to maxSide exactly and round the
              // short one: floor(w * (maxSide/w)) can land on
              // maxSide-1 through float error (63 * (32/63.0) =
              // 31.999…), which would break the contract on its own
              // input
              val scale = maxSide.toDouble / side
              val ow = if (w >= h) maxSide
                       else math.max(1, math.round(w * scale).toInt)
              val oh = if (w >= h) math.max(1, math.round(h * scale).toInt)
                       else maxSide
              val dst = new java.awt.image.BufferedImage(
                ow, oh, java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g2 = dst.createGraphics()
              g2.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g2.drawImage(img, 0, 0, ow, oh, null)
              g2.dispose()
              val out = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(dst, "png", out)
              Row(id, out.toByteArray, ow, oh, true)
            }
          }
        }
      }(enc)
  }

  /** End-to-end REAL resize round-trip, fully oracled — the
    * [[realMediaFeatures]] treatment applied to the resize kernel:
    * documents → ImageIO PNG encode → bilinear Graphics2D resize →
    * PNG re-encode → ImageIO decode → pixel stats. Bilinear
    * interpolation of a SOLID color is exactly that color at every
    * output pixel, and the output dims are a pure integer function of
    * doc_id and maxSide (long side pinned to maxSide, short side
    * floor(x+0.5)-rounded), so DuckDB replays dims + micro-means +
    * modal luma bin without ever seeing a compressed byte — the
    * actual codec and scaler run inside the plan, the oracle checks
    * their output exactly. */
  def realResizeFeatures(t: Tables, maxSide: Int = 20, bins: Int = 5): DataFrame = {
    val dec = decodeImageFeatures(
      resizeImage(encodePngMedia(t.documents), maxSide), bins)
    dec.select(
        col("doc_id"),
        col("decoded").cast("int").as("decoded"),
        col("img_width"), col("img_height"),
        floor(col("mean_r") * 1000000d + 0.5d).cast("long").as("mean_r_micro"),
        floor(col("mean_g") * 1000000d + 0.5d).cast("long").as("mean_g_micro"),
        floor(col("mean_b") * 1000000d + 0.5d).cast("long").as("mean_b_micro"),
        expr(s"""filter(transform(luma_hist, (c, i) -> IF(c = array_max(luma_hist), i, -1)),
                        i -> i >= 0)[0]""").cast("int").as("luma_mode_bin"))
      .orderBy(col("doc_id"))
  }

  private val gifSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media", BinaryType),
    StructField("format", StringType),
    StructField("n_frames", IntegerType)))

  /** Attach a REAL multi-frame container per document: an ANIMATED GIF
    * of `nFrames` solid-color frames written by the actual ImageIO GIF
    * sequence writer — a genuine container format (LZW-compressed
    * frames, per-frame palette) standing in for video. Frame i's color
    * is a deterministic function of md5(text) and i
    * ((r+17i, g+29i, b+43i) mod 256), and each frame carries an
    * EXPLICIT 2-entry IndexColorModel holding exactly that color, so
    * the GIF round-trip is LOSSLESS by construction (no writer-side
    * palette quantization) — which is what lets [[frameExtract]] be
    * fully oracled, the [[realMediaFeatures]] treatment for the video
    * path. */
  def encodeGifMedia(docs: DataFrame, nFrames: Int = 8): DataFrame = {
    val enc = Encoders.row(gifSchema)
    Dedup.spread(docs.select(col("doc_id"), unhex(md5(col("text"))).as("h")))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { row =>
          val id = row.getLong(0)
          val h = row.getAs[Array[Byte]](1)
          val w = (id % 16 + 8).toInt
          val ht = (id % 12 + 6).toInt
          val bos = new java.io.ByteArrayOutputStream()
          val writer = javax.imageio.ImageIO
            .getImageWritersByFormatName("gif").next()
          val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          var i = 0
          while (i < nFrames) {
            val r = ((h(0) & 0xff) + 17 * i) % 256
            val g = ((h(1) & 0xff) + 29 * i) % 256
            val b = ((h(2) & 0xff) + 43 * i) % 256
            val icm = new java.awt.image.IndexColorModel(8, 2,
              Array(r.toByte, 0.toByte), Array(g.toByte, 0.toByte),
              Array(b.toByte, 0.toByte))
            val img = new java.awt.image.BufferedImage(w, ht,
              java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
            // raster default-initializes to index 0 == the frame color
            writer.writeToSequence(
              new javax.imageio.IIOImage(img, null, null), null)
            i += 1
          }
          writer.endWriteSequence()
          ios.close()
          writer.dispose()
          Row(id, bos.toByteArray, "image/gif", nFrames)
        }
      }(enc)
  }

  private val frameSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("fr_width", IntegerType),
    StructField("fr_height", IntegerType),
    StructField("mean_r", DoubleType),
    StructField("mean_g", DoubleType),
    StructField("mean_b", DoubleType)))

  /** REAL frame extraction: the ImageIO GIF reader parses the
    * container, `getNumImages` counts its frames, and every
    * `everyNth`-th frame is decoded and reduced to per-channel means —
    * one output row per SAMPLED frame, the video analog of explode,
    * with the decode inside the same per-partition kernel shape as the
    * image path. Undecodable payloads yield zero rows (filter, never
    * throw). */
  def frameExtract(media: DataFrame, everyNth: Int = 3): DataFrame = {
    val enc = Encoders.row(frameSchema)
    media.select(col("doc_id"), col("media"))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.flatMap { row =>
          val id = row.getLong(0)
          val bytes = row.getAs[Array[Byte]](1)
          try {
            val reader = javax.imageio.ImageIO
              .getImageReadersByFormatName("gif").next()
            val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
              new java.io.ByteArrayInputStream(bytes))
            reader.setInput(iis)
            val n = reader.getNumImages(true)
            val out = (0 until n by everyNth).map { i =>
              val img = reader.read(i)
              val w = img.getWidth
              val ht = img.getHeight
              var sr = 0L; var sg = 0L; var sb = 0L
              var y = 0
              while (y < ht) {
                var x = 0
                while (x < w) {
                  val p = img.getRGB(x, y)
                  sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
                  x += 1
                }
                y += 1
              }
              val cnt = w.toLong * ht
              Row(id, i, n, w, ht, sr.toDouble / cnt / 255d,
                sg.toDouble / cnt / 255d, sb.toDouble / cnt / 255d)
            }
            reader.dispose(); iis.close()
            out
          } catch { case _: Exception => Nil }
        }
      }(enc)
  }

  /** End-to-end REAL container round-trip, fully oracled: documents →
    * animated-GIF encode (8 frames) → frame extraction (every 3rd) →
    * exact per-frame color stats. The indexed palette makes the GIF
    * lossless, so every output column is a pure integer/double
    * function of (md5(text), doc_id, frame_idx) that DuckDB replays —
    * real LZW-compressed container bytes flow through the plan, the
    * oracle checks the decoded output exactly. */
  def realFrameFeatures(t: Tables, nFrames: Int = 8,
                        everyNth: Int = 3): DataFrame =
    frameExtract(encodeGifMedia(t.documents, nFrames), everyNth)
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("n_frames").cast("long").as("n_frames"),
        col("fr_width").cast("long").as("fr_width"),
        col("fr_height").cast("long").as("fr_height"),
        floor(col("mean_r") * 1000000d + 0.5d).cast("long").as("mean_r_micro"),
        floor(col("mean_g") * 1000000d + 0.5d).cast("long").as("mean_g_micro"),
        floor(col("mean_b") * 1000000d + 0.5d).cast("long").as("mean_b_micro"))
      .orderBy(col("doc_id"), col("frame_idx"))

  /** Frame sampling: one row per sampled frame index — the video
    * analog of explode. A real decoder would slice the container; the
    * stub derives per-frame bytes from (media, frame_idx). */
  def frameSample(media: DataFrame, nFrames: Int = 120, everyNth: Int = 30): DataFrame =
    media
      .withColumn("frame_idx",
        explode(sequence(lit(0), lit(nFrames.toLong - 1), lit(everyNth.toLong))))
      .withColumn("frame",
        unhex(md5(concat(hex(col("media")), col("frame_idx").cast("string")))))
      .select(col("doc_id"), col("frame_idx"), col("frame"))

  // ——— REAL audio path (javax.sound.sampled) ———

  private val wavSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media", BinaryType),
    StructField("format", StringType),
    StructField("n_samples", IntegerType)))

  /** Attach a REAL audio payload per document: a 16-bit mono PCM WAV
    * written by the actual `javax.sound.sampled` encoder (RIFF/WAVE
    * container). The waveform is a deterministic integer sawtooth —
    * s(k) = ((seed + k·step) mod 65536) − 32768 with seed/step from
    * md5(text) — so PCM being lossless makes every decoded sample an
    * exact integer function of (text, k): the audio analog of the
    * PNG/GIF contract, and what lets [[realAudioFeatures]] be fully
    * oracled. */
  def encodeWavMedia(docs: DataFrame, nSamples: Int = 2048,
                     sampleRate: Int = 8000): DataFrame = {
    val enc = Encoders.row(wavSchema)
    Dedup.spread(docs.select(col("doc_id"), unhex(md5(col("text"))).as("h")))
      .mapPartitions { rows =>
        rows.map { row =>
          val id = row.getLong(0)
          val h = row.getAs[Array[Byte]](1)
          val seed = ((h(0) & 0xff) << 8) | (h(1) & 0xff)
          val step = (((h(2) & 0xff) << 8) | (h(3) & 0xff)) | 1
          val pcm = new Array[Byte](nSamples * 2)
          var k = 0
          while (k < nSamples) {
            val s = ((seed + k.toLong * step) % 65536).toInt - 32768
            pcm(2 * k) = (s & 0xff).toByte          // little-endian
            pcm(2 * k + 1) = ((s >> 8) & 0xff).toByte
            k += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(
            sampleRate.toFloat, 16, 1, true, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          Row(id, bos.toByteArray, "audio/wav", nSamples)
        }
      }(enc)
  }

  private val audioSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("decoded", BooleanType),
    StructField("n_samples", LongType),
    StructField("sample_rate", IntegerType),
    StructField("peak_abs", LongType),
    StructField("sum_sq", LongType),
    StructField("n_pos", LongType)))

  /** REAL audio decode: `AudioSystem.getAudioInputStream` parses the
    * RIFF container (format, rate, sample width from the actual
    * header), the PCM body is drained and reduced to exact integer
    * stats — peak amplitude, energy (Σ s², bounded by 2¹⁵²·n ≪ 2⁶³),
    * non-negative-sample count. Undecodable payloads return
    * decoded=false; the curation-filter contract of the image path. */
  def decodeAudioFeatures(media: DataFrame): DataFrame = {
    val enc = Encoders.row(audioSchema)
    media.select(col("doc_id"), col("media"))
      .mapPartitions { rows =>
        rows.map { row =>
          val id = row.getLong(0)
          val bytes = row.getAs[Array[Byte]](1)
          try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            val fmt = ais.getFormat
            require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1)
            val body = ais.readAllBytes()
            val n = body.length / 2
            var peak = 0L; var ss = 0L; var pos = 0L
            var k = 0
            while (k < n) {
              val s = ((body(2 * k) & 0xff) | (body(2 * k + 1) << 8)).toShort.toLong
              if (math.abs(s) > peak) peak = math.abs(s)
              ss += s * s
              if (s >= 0) pos += 1
              k += 1
            }
            Row(id, true, n.toLong, fmt.getSampleRate.toInt, peak, ss, pos)
          } catch {
            case _: Exception => Row(id, false, null, null, null, null, null)
          }
        }
      }(enc)
  }

  /** End-to-end REAL audio round-trip, fully oracled: documents → WAV
    * encode → container decode → exact integer sample statistics. The
    * sawtooth replays in SQL as a generate_series aggregate, so the
    * oracle covers the real RIFF/PCM codec path exactly. */
  def realAudioFeatures(t: Tables, nSamples: Int = 2048): DataFrame =
    decodeAudioFeatures(encodeWavMedia(t.documents, nSamples))
      .select(col("doc_id"), col("decoded").cast("int").as("decoded"),
        col("n_samples"), col("sample_rate").cast("long").as("sample_rate"),
        col("peak_abs"), col("sum_sq"), col("n_pos"))
      .orderBy(col("doc_id"))

  // ——— WebDataset shards: the three modalities in one container ———

  /** WARC ingest end-to-end (r17, oracled): documents become HTML
    * pages wrapped in REAL ISO 28500 WARC shards — per-record gzip
    * members, warcinfo header record, HTTP response payloads (the
    * Common Crawl layout, [[graft.sources.WarcIngest]]) — then parsed
    * BACK in-plan and text-extracted (the q_html_extract composition):
    * per page, status, byte length, body digest, and the tag-stripped
    * text length. The oracle recomputes every column from the
    * documents directly, so the whole build → gzip → parse → extract
    * loop is gated on byte-exact body recovery (md5 equality fails on
    * any single corrupted byte). */
  def warcExtract(t: Tables): DataFrame = {
    val pages = Dedup.spread(t.documents.select(col("doc_id"), col("text")))
      .select((col("doc_id") % 16).as("shard_id"),
        concat(lit("https://example.org/doc/"),
          col("doc_id").cast("string")).as("target_uri"),
        concat(lit("<html><head><title>doc "),
          col("doc_id").cast("string"),
          lit("</title></head><body><p>"), col("text"),
          lit("</p></body></html>")).cast("binary").as("body"))
    graft.sources.WarcIngest
      .parseWarc(graft.sources.WarcIngest.warcShards(pages,
        perRecordGzip = true))
      .filter(col("warc_type") === "response")
      .select(
        regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1)
          .cast("long").as("doc_id"),
        col("http_status"),
        octet_length(col("body")).cast("long").as("n_body_bytes"),
        md5(col("body")).as("body_md5"),
        length(trim(regexp_replace(regexp_replace(
          col("body").cast("string"), "<[^>]*>", " "), "\\s+", " ")))
          .cast("long").as("n_text_chars"))
      .orderBy(col("doc_id"))
  }

  /** Pack each document as a REAL WebDataset sample — `<id>.txt` +
    * `<id>.png` + `<id>.wav` entries sharing a key inside ustar
    * shards, the layout multimodal training loaders stream. Composes
    * the codec kernels with [[graft.sources.TarShards]]: all bytes
    * are genuine (zlib PNG, RIFF PCM, POSIX tar), all deterministic. */
  def webdatasetShards(t: Tables, docsPerShard: Int = 64,
                       nSamples: Int = 512): DataFrame = {
    val sid = (col("doc_id") / docsPerShard).cast("long").as("shard_id")
    val nm = (ext: String) =>
      concat(col("doc_id").cast("string"), lit("." + ext)).as("name")
    val txt = Dedup.spread(t.documents.select(col("doc_id"), col("text")))
      .select(sid, nm("txt"), col("text").cast("binary").as("content"))
    val png = encodePngMedia(t.documents)
      .select(sid, nm("png"), col("media").as("content"))
    val wav = encodeWavMedia(t.documents, nSamples)
      .select(sid, nm("wav"), col("media").as("content"))
    graft.sources.TarShards.tarEntryShards(txt.unionByName(png).unionByName(wav))
  }

  /** The loader side: untar the shards and fold same-key entries back
    * into one row per sample with one typed column per modality — the
    * WebDataset grouping rule (key = name up to the extension). */
  def webdatasetSamples(shards: DataFrame): DataFrame =
    graft.sources.TarShards.untar(shards)
      .select(
        expr("CAST(substring_index(name, '.', 1) AS BIGINT)").as("doc_id"),
        expr("substring_index(name, '.', -1)").as("ext"),
        col("content"))
      .groupBy(col("doc_id"))
      .agg(
        first(when(col("ext") === "txt", col("content")), ignoreNulls = true)
          .as("txt"),
        first(when(col("ext") === "png", col("content")), ignoreNulls = true)
          .as("png"),
        first(when(col("ext") === "wav", col("content")), ignoreNulls = true)
          .as("wav"))

  /** The `.tar.gz`-from-DISK loader path a training job actually runs
    * (r15, oracled as q_webdataset_gz): shards are gzipped
    * ([[graft.sources.TarShards.gzipShards]], JDK Deflate), written as
    * REAL `.tar.gz` files — one per shard, EXECUTOR-side I/O via
    * foreachPartition (the object-store PUT shape; never a driver
    * collect) — then read back through Spark's `binaryFile` source,
    * inflated by untar's 1f-8b magic sniff, and regrouped into
    * samples. The output is per-sample identity evidence: the
    * file-name-derived shard id, the modality count (all three
    * entries survived the container), and the text entry byte-exact
    * (length + md5) — all SQL-expressible, so the WHOLE
    * gzip → disk → binaryFile → inflate → regroup loop is gated in
    * DuckDB. */
  def webdatasetGzFromDisk(t: Tables, docsPerShard: Int = 64,
                           nSamples: Int = 512,
                           stagingUri: Option[String] = None): DataFrame = {
    val spark = t.documents.sparkSession
    // Shard PUTs go through the Hadoop FileSystem API against ONE
    // URI (`stagingUri`, e.g. s3a://bucket/stage or hdfs:///stage),
    // so the executor-side writes and the driver-side binaryFile glob
    // resolve to the same store on a real cluster — a bare
    // java.nio path would land on each executor's local disk and the
    // glob would miss every shard. The default (a driver temp dir) is
    // the local-mode/shared-FS convenience only.
    val dir = stagingUri.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-wds-gz").toUri.toString)
    val confB = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    graft.sources.TarShards.gzipShards(webdatasetShards(t, docsPerShard, nSamples))
      .select(col("shard_id"), col("tar"))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        val base = new org.apache.hadoop.fs.Path(dir)
        val fs = base.getFileSystem(confB.value.value)
        it.foreach { r =>
          val p = new org.apache.hadoop.fs.Path(
            base, f"shard-${r.getLong(0)}%05d.tar.gz")
          val out = fs.create(p, true)
          try out.write(r.getAs[Array[Byte]](1)) finally out.close()
        }
      }
    val files = graft.sources.BinaryIngest
      .binaryFiles(spark, dir.stripSuffix("/") + "/shard-*.tar.gz")
      .select(
        regexp_extract(col("path"), "shard-(\\d+)\\.tar\\.gz$", 1)
          .cast("long").as("shard_id"),
        col("content").as("tar"))
    graft.sources.TarShards.untar(files)
      .select(col("shard_id"),
        expr("CAST(substring_index(name, '.', 1) AS BIGINT)").as("doc_id"),
        expr("substring_index(name, '.', -1)").as("ext"),
        col("content"))
      .groupBy(col("doc_id"))
      .agg(
        first(col("shard_id")).as("shard_id"),
        countDistinct(col("ext")).as("n_modalities"),
        first(when(col("ext") === "txt", col("content")), ignoreNulls = true)
          .as("txt"))
      .select(col("doc_id"), col("shard_id"), col("n_modalities"),
        octet_length(col("txt")).cast("long").as("n_chars"),
        md5(col("txt")).as("fingerprint"))
      .orderBy(col("doc_id"))
  }

  /** Oracled end-to-end: documents → WebDataset shards → loader →
    * per-modality decode → one stats row per sample. Every column is
    * an exact integer function of the source text, so the WHOLE
    * container + three-codec path is gated in DuckDB: text length,
    * decoded PNG color, decoded PCM peak/energy. */
  def webdatasetFeatures(t: Tables, nSamples: Int = 512): DataFrame = {
    val samples = webdatasetSamples(webdatasetShards(t, nSamples = nSamples))
      .persistTracked() // three decode scans share the loader output
    val img = decodeImageFeatures(
      samples.select(col("doc_id"), col("png").as("media")))
      .select(col("doc_id"),
        floor(col("mean_r") * 1000000d + 0.5d).cast("long").as("mean_r_micro"))
    val aud = decodeAudioFeatures(
      samples.select(col("doc_id"), col("wav").as("media")))
      .select(col("doc_id"), col("peak_abs"), col("sum_sq"))
    samples
      .select(col("doc_id"),
        length(col("txt").cast("string")).cast("long").as("n_chars"))
      .join(img, Seq("doc_id"))
      .join(aud, Seq("doc_id"))
      .orderBy(col("doc_id"))
  }

  /** Oracle-verifiable slice: the metadata plumbing (binary length +
    * typed dims) — everything except the non-SQL decode kernel. */
  def mediaMeta(t: Tables): DataFrame =
    withFakeMedia(t.documents)
      .select(col("doc_id"), octet_length(col("media")).cast("long").as("n_bytes"),
        col("format"), col("width"), col("height"))
      .orderBy(col("doc_id"))

  /** End-to-end: media → mapPartitions decode → features. Fully
    * oracled: each float32 feature is snapped to integer micro-units
    * BEFORE the sum (float→double cast is exact, ×10⁶ and floor are
    * deterministic IEEE ops), so the aggregate crosses engines as an
    * order-free integer sum — a float sum's low bits would depend on
    * accumulation order, which no engine guarantees per group. */
  def mediaFeatures(t: Tables): DataFrame =
    decodeFeatures(withFakeMedia(t.documents))
      .select(col("doc_id"), col("n_bytes"), col("feature_dim"),
        aggregate(col("features"), lit(0L),
          (a, v) => a + floor(v.cast("double") * 1000000d + 0.5d))
          .as("feat_sum_micro"))
      .orderBy(col("doc_id"))

  // ——— perceptual-hash image dedup (r16) ———

  private val grayPngSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media", BinaryType)))

  /** Per-pixel gray for the dHash corpus: an md5-derived integer
    * function of (family, x, y) with family = doc_id % 97, so every
    * family shares ONE 8×8 image; docs with doc_id % 5 == 0 carry a
    * single brightened pixel at an id-derived position — the
    * re-encoded/watermarked near-duplicate case, a ≤2-bit dHash
    * perturbation. Pure integer arithmetic over md5 hex, replayed
    * verbatim by the oracle. */
  private def grayAt(docId: Long, x: Int, y: Int): Int = {
    val fam = docId % 97
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${fam}_${x}_${y}".getBytes("UTF-8"))
    val g = md(0) & 0xff
    if (docId % 5 == 0 && x == (docId % 8).toInt && y == ((docId / 8) % 8).toInt)
      (g + 128) % 256
    else g
  }

  /** REAL 8×8 grayscale PNG per document (ImageIO encode). */
  def encodeDHashPng(docs: DataFrame): DataFrame = {
    val enc = Encoders.row(grayPngSchema)
    Dedup.spread(docs.select(col("doc_id")))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { row =>
          val id = row.getLong(0)
          val img = new java.awt.image.BufferedImage(
            8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              val g = grayAt(id, x, y)
              img.setRGB(x, y, (g << 16) | (g << 8) | g); x += 1
            }
            y += 1
          }
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", out)
          Row(id, out.toByteArray)
        }
      }(enc)
  }

  /** REAL ImageIO decode → 56-bit difference hash: bit (y·7+x) set iff
    * gray(x+1, y) > gray(x, y) — the classic dHash gradient signature,
    * computed from DECODED pixels (PNG lossless ⇒ exact). 56 bits
    * keeps every shift < 63 (BIGINT-safe in both engines). */
  def decodeDHash(media: DataFrame): DataFrame = {
    val enc = Encoders.row(StructType(Seq(
      StructField("doc_id", LongType), StructField("dhash", LongType))))
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { row =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(row.getAs[Array[Byte]](1)))
        var h = 0L
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 7) {
            if ((img.getRGB(x + 1, y) & 0xff) > (img.getRGB(x, y) & 0xff))
              h |= 1L << (y * 7 + x)
            x += 1
          }
          y += 1
        }
        Row(row.getLong(0), h)
      }
    }(enc)
  }

  /** Image near-dup dedup by PERCEPTUAL hash (dHash + Hamming-LSH +
    * closure): the image-side of the dedup family — re-encoded,
    * slightly-retouched copies hash within a few bits, so banding the
    * 56-bit hash into 4×14-bit keys makes candidate discovery an
    * EQUI-join (2 corrupted bits can kill at most 2 bands, so a
    * Hamming-≤2 pair always shares ≥2 intact bands — complete, never
    * all-pairs), bit_count(XOR) verifies, and connected components
    * collapse transitive chains into clusters. The whole pipeline
    * runs on REAL codec bytes (ImageIO PNG encode → decode → hash);
    * the oracle replays the pixel formula → dHash → band join →
    * recursive-CTE closure, so the gate covers hash math, banding
    * completeness, and the closure.
    *
    * Scale: hashes are 8 bytes/image (the corpus never re-shuffles),
    * and EXACT duplicates collapse to one representative per distinct
    * hash BEFORE the pair join — identical-image mega-families (the
    * common case: one logo shipped a million times) cost one groupBy,
    * never quadratic pairs; banding, verification, and the closure run
    * on representatives only (bounded by hash DIVERSITY, not corpus
    * size), and membership broadcasts back through the dhash join.
    * Result-identical to the naive all-docs pair graph: same-hash docs
    * are the same rep node, distinct-hash edges are preserved, and the
    * component label (min rep id = min member id) is unchanged —
    * measured 5.2× → 1.4× at 10× data with 10× bigger families. */
  def imagePhash(t: Tables): DataFrame = {
    import graft.CacheRegistry.Tracked
    val hashed = decodeDHash(encodeDHashPng(t.documents)).persistTracked()
    val reps = hashed.groupBy(col("dhash"))
      .agg(min(col("doc_id")).as("rep")).persistTracked()
    val bands = reps.select(col("rep"), col("dhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("b"),
          shiftright(col("dhash"), b * 14).bitwiseAND(lit(0x3fffL)).as("v"))): _*))
        .as("band"))
      .select(col("rep"), col("dhash"),
        col("band.b").as("b"), col("band.v").as("v"))
    val pairs = bands.select(col("b"), col("v"), col("rep").as("a"),
        col("dhash").as("ha"))
      .join(bands.select(col("b"), col("v"), col("rep").as("bb"),
        col("dhash").as("hb")), Seq("b", "v"))
      .filter(col("a") < col("bb"))
      .select(col("a"), col("bb").as("b2"), col("ha"), col("hb")).distinct()
      .filter(bit_count(col("ha").bitwiseXOR(col("hb"))) <= 2)
      .select(col("a"), col("b2").as("b"))
    val cc = Components.connectedComponents(pairs)
      .select(col("node").as("rep"), col("lbl"))
    val repLbl = reps.join(cc, Seq("rep"), "left")
      .select(col("dhash"), coalesce(col("lbl"), col("rep")).as("cluster_id"))
    hashed.join(repLbl, Seq("dhash"))
      .withColumn("cluster_size", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("cluster_id")))
        .cast("long"))
      .select(col("doc_id"), col("dhash"), col("cluster_id"), col("cluster_size"))
      .orderBy(col("doc_id"))
  }
}
