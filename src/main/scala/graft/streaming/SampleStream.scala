package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming priority sampler — the streaming analog of
  * `Curation.weightedSample` (Duffield–Lund–Thorup priority sampling):
  * each arriving document draws the SAME deterministic md5-uniform
  * priority w/u as the batch operator, and per-source state keeps only
  * the current top-k (priority, doc) entries.
  *
  * Why this shape at scale: a weighted sample over an unbounded stream
  * needs O(k) state per stratum — nothing else. State never grows with
  * stream length, no watermark is required (the sample is
  * order-insensitive: priorities are a pure function of the document,
  * so late data folds in exactly like on-time data), and determinism
  * means the streaming sample over any prefix EQUALS the batch
  * operator run over the same rows — SampleStreamSpec pins that
  * equivalence, which is the property that makes a Lambda-architecture
  * backfill byte-compatible with the online path.
  */
object SampleStream {

  case class Doc(source: String, doc_id: Long, n_chars: Long)
  case class TopK(top: Seq[(Double, Long, Long)]) // (priority, doc_id, n_chars)
  case class SampleOut(source: String, doc_id: Long, n_chars: Long,
                       priority: Double)

  /** The batch operator's priority, computed driver/executor-side:
    * identical multiply-then-divide order, so the double is bit-equal
    * to the SQL expression's (Round11Spec pins the equality). */
  def priorityOf(docId: Long, nChars: Long): Double = {
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(docId.toString.getBytes("UTF-8"))
    val hex = md5.take(4).map("%02x".format(_)).mkString
    val u = (java.lang.Long.parseLong(hex, 16) & 0x7FFFFFFFL) + 1L
    nChars.toDouble * 2147483648.0 / u.toDouble
  }

  /** Merge new docs into a top-k state. Pure — unit-testable without a
    * stream. Re-delivered doc_ids collapse (exactly-once sample under
    * at-least-once delivery).
    *
    * CONTRACT: a doc_id's payload is immutable across redeliveries —
    * `distinctBy(_._2)` keeps the FIRST-seen (doc_id, n_chars) entry, so
    * a redelivery carrying a DIFFERENT n_chars keeps the original
    * priority. That is the same assumption the batch-equivalence
    * property rests on (the batch operator sees one row per doc_id, so
    * "which version" is ill-posed there); a source that mutates
    * payloads must ship versioned ids (doc_id, version) as the key. */
  def merge(prev: Seq[(Double, Long, Long)], docs: Seq[Doc], k: Int)
      : Seq[(Double, Long, Long)] =
    (prev ++ docs.map(d => (priorityOf(d.doc_id, d.n_chars), d.doc_id, d.n_chars)))
      .distinctBy(_._2)
      .sortBy { case (p, id, _) => (-p, id) }
      .take(k)

  /** Update-mode stream: every micro-batch re-emits each touched
    * source's CURRENT top-k sample (k rows per source — bounded
    * output, bounded state). */
  def sampled(docs: Dataset[Doc], k: Int = 5): Dataset[SampleOut] = {
    implicit val outEnc = Encoders.product[SampleOut]
    implicit val stEnc = Encoders.product[TopK]
    docs
      .groupByKey(_.source)(Encoders.STRING)
      .flatMapGroupsWithState[TopK, SampleOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (source: String, it: Iterator[Doc], state: GroupState[TopK]) =>
          val top = merge(state.getOption.map(_.top).getOrElse(Nil), it.toSeq, k)
          state.update(TopK(top))
          top.iterator.map { case (p, id, nc) => SampleOut(source, id, nc, p) }
      }
  }
}
