package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video travel as opaque
  * `binary` columns with typed metadata; decode / feature-extraction
  * runs in `mapPartitions` so a real decoder would amortize model/
  * codec init once per partition (the batch-shaped UDF pattern).
  *
  * The decode kernel itself is a STUB — media codecs aren't in this
  * container — but it is deterministic, so the surrounding plumbing
  * (schema, batching, partitioning) is fully testable and swaps to a
  * real decoder without touching the plan.
  */
object Multimodal {

  /** Attach a deterministic fake media payload + metadata to documents:
    * media = md5(text) bytes, dimensions derived from doc_id. Stands in
    * for reading a real object-store column. */
  def withFakeMedia(docs: DataFrame): DataFrame =
    docs.select(
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
            // ??? real decode goes here; deterministic fake:
            (bytes(i % bytes.length) & 0xff).toFloat / 255f
          }
          Row(id, bytes.length.toLong, dim, feats)
        }
      }(enc)
  }

  /** Resize stub: recompute target dims preserving aspect ratio and
    * derive the "resized" payload deterministically (a real impl swaps
    * the kernel, not the plan). Pure column expressions — map-side. */
  def resizeStub(media: DataFrame, maxSide: Long): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide) / greatest(col("width"), col("height")))
    media
      .withColumn("out_width", floor(col("width") * scale).cast("long"))
      .withColumn("out_height", floor(col("height") * scale).cast("long"))
      .withColumn("media", when(scale < 1.0, sha2(col("media"), 256).cast("binary"))
        .otherwise(col("media")))
  }

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
}
