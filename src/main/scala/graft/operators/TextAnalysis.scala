package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: language ID,
  * quality scoring, token counting, fingerprinting. All pure Catalyst
  * expressions (codegen'd, no UDFs) — at 100 TB these run map-side at
  * scan speed with zero shuffles before the final aggregate/sort.
  */
object TextAnalysis {

  /** Language marker words (stopword heuristic). Priority order is the
    * deterministic tie-break. */
  val Markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "los", "y", "que", "en"),
    "fr" -> Seq("le", "les", "et", "des", "un"),
    "zh" -> Seq("de", "shi", "le", "wo", "ni"))

  /** Count of tokens of `c` (split on single space) present in `words`. */
  private def markerCount(c: Column, words: Seq[String]): Column =
    size(filter(graft.functions.TextFunctions.tokens(c), t => t.isInCollection(words))).cast("long")

  /** n-gram/stopword language ID: argmax of marker counts with
    * first-listed-wins tie-break (a chained CASE, same as the oracle). */
  def langIdCols(text: Column): Seq[Column] = {
    val scores = Markers.map { case (lang, ws) => lang -> markerCount(text, ws) }
    // chained argmax: lang_i wins if its score >= all later scores
    def argmax(rem: List[(String, Column)]): Column = rem match {
      case (lang, s) :: Nil => lit(lang)
      case (lang, s) :: rest =>
        when(rest.map(_._2).foldLeft(lit(true))((acc, o) => acc && s >= o), lit(lang))
          .otherwise(argmax(rest))
      case Nil => lit(null)
    }
    scores.map { case (lang, s) => s.as(s"score_$lang") } :+
      argmax(scores.toList).as("pred_lang")
  }

  def langId(t: Tables): DataFrame =
    t.documents
      .select(col("doc_id") +: langIdCols(col("text")): _*)
      .orderBy(col("doc_id"))

  /** Quality metrics: length, punctuation ratio, stopword ratio, mean
    * token length. Ratios are single double divisions of exact integer
    * counts — bit-identical across engines, no rounding needed. */
  def quality(t: Tables): DataFrame = {
    val txt = col("text")
    val toks = graft.functions.TextFunctions.tokens(txt)
    val nChars = length(txt).cast("long")
    val nToks = size(toks).cast("long")
    val nPunct = (length(txt) - length(regexp_replace(txt, "[.,;:!?]", ""))).cast("long")
    val enStop = Markers.head._2
    val nStop = size(filter(toks, _.isInCollection(enStop))).cast("long")
    t.documents.select(
        col("doc_id"),
        nChars.as("n_chars_m"),
        nToks.as("n_tokens"),
        (nPunct.cast("double") / nChars).as("punct_ratio"),
        (nStop.cast("double") / nToks).as("stopword_ratio"),
        (nChars.cast("double") / nToks).as("mean_token_len"))
      .orderBy(col("doc_id"))
  }

  /** Token counting two ways: whitespace tokens and a BPE-ish regex
    * (letter runs / single digits / single punctuation). */
  def tokenCounts(t: Tables): DataFrame =
    t.documents.select(
        col("doc_id"),
        regexp_count(col("text"), lit("[^ ]+")).cast("long").as("ws_tokens"),
        regexp_count(col("text"), lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]")).cast("long")
          .as("bpe_tokens"))
      .orderBy(col("doc_id"))

  /** Normalization fingerprint: md5 of (lower, collapse spaces, trim).
    * The rolling-hash shingle fingerprint (custom codegen'd expression)
    * is exercised in HashExpressionsSpec — not SQL-expressible. */
  def fingerprint(t: Tables): DataFrame =
    t.documents.select(
        col("doc_id"),
        md5(trim(regexp_replace(lower(col("text")), " +", " "))).as("fp"))
      .orderBy(col("doc_id"))
}
