package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** One-pass sliding-window minimum over a string array — the winnowing
  * kernel. The HOF spelling (`transform(sequence(...), j =>
  * array_min(slice(hs, j, w)))`) allocates a w-element array per window
  * and runs interpreted; this loops over the UTF8String array once per
  * row inside whole-stage codegen. O(n·w) comparisons — w is a small
  * constant (5), so a monotonic deque would cost more in bookkeeping
  * than it saves. Output i = min(a[i..i+w-1]) for i in 0..max(n-w, 0)
  * (the tail window truncates like `slice`); empty input → empty.
  * Input elements MUST be non-null (winnowing feeds it hash strings);
  * a null element fails with a descriptive error rather than a deep
  * NPE inside UTF8String.compareTo. */
object GraftTextKernels {

  /** NFC-normalize one UTF8String; identity (no copy) when already
    * normalized. */
  def nfc(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def slidingMin(a: org.apache.spark.sql.catalyst.util.ArrayData, w: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = a.numElements()
    if (n == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[AnyRef])
    var k = 0
    while (k < n) {
      if (a.isNullAt(k))
        throw new IllegalArgumentException(
          s"graft_sliding_min: null element at index $k — input must be a non-null string array")
      k += 1
    }
    val nOut = math.max(n - w + 1, 1)
    val out = new Array[AnyRef](nOut)
    var j = 0
    while (j < nOut) {
      var m = a.getUTF8String(j)
      var i = j + 1
      val end = math.min(j + w, n)
      while (i < end) {
        val c = a.getUTF8String(i)
        if (c.compareTo(m) < 0) m = c
        i += 1
      }
      out(j) = m
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** NFC Unicode normalization as a native codegen'd expression —
  * java.text.Normalizer under whole-stage codegen (no UDF): canonical
  * composition so visually-identical strings ("e" + U+0301 vs U+00E9)
  * hash and dedup identically — a real-corpus prerequisite for every
  * hash-keyed operator here. The isNormalized fast path makes the
  * already-NFC common case a scan-speed check. DuckDB's
  * nfc_normalize replays it exactly (both implement UAX #15). */
case class NfcNormalize(
    child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_nfc requires string, got ${other.catalogString}")
    }
  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.StringType
  override def nullSafeEval(input: Any): Any =
    GraftTextKernels.nfc(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftTextKernels.nfc($c)")
  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): NfcNormalize =
    copy(child = newChild)
  override def prettyName: String = "graft_nfc"
}

case class SlidingMin(child: org.apache.spark.sql.catalyst.expressions.Expression, w: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(w >= 1, "window must be at least 1")
  // Elements must be non-null at runtime (enforced with a descriptive
  // error in the kernel); the static check only pins array<string>
  // because upstream HOF types routinely widen to containsNull=true
  // even when values never are.
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_sliding_min requires array<string>, got ${other.catalogString}")
    }
  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType,
      containsNull = false)
  override def nullSafeEval(input: Any): Any =
    GraftTextKernels.slidingMin(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], w)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftTextKernels.slidingMin($c, $w)")
  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): SlidingMin =
    copy(child = newChild)
  override def prettyName: String = "graft_sliding_min"
}

/** String-cleaning primitives mirroring the reference's text handling,
  * all as codegen'd Catalyst expressions (no UDFs).
  */
object TextFunctions {

  /** NFC normalization column (see [[NfcNormalize]]). */
  def nfcNormalize(c: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      NfcNormalize(org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)))

  /** Repair the common latin1-read-as-UTF8 mojibake the reference fixes
    * one gsub at a time (crowdsorsa-etl-2023.R:90-94: "Ã¶"→"ö", "Ã¤"→"ä"). */
  def fixMojibake(c: Column): Column =
    Seq("Ã¶" -> "ö", "Ã¤" -> "ä")
      .foldLeft(c) { case (acc, (bad, good)) =>
        regexp_replace(acc, java.util.regex.Pattern.quote(bad), good)
      }

  /** First-occurrence-only literal substitution — R's `sub` semantics
    * (crowdsorsa-etl-2024.R:36-37 rewrites the year once per value),
    * unlike Spark's replace-all `regexp_replace`. */
  def subFirst(c: Column, find: String, repl: String): Column = {
    val pos = instr(c, find)
    when(pos > 0,
      concat(
        c.substr(lit(1), pos - 1),
        lit(repl),
        c.substr(pos + find.length, length(c))))
      .otherwise(c)
  }

  /** The reference's full cleaning chain: mojibake repair → lowercase →
    * one-shot substitution (2023.R:88-94 + 2024.R:36-37,58). */
  def cleanText(c: Column, find: String, repl: String): Column =
    subFirst(lower(fixMojibake(c)), find, repl)

  /** THE canonical tokenizer, shared by every oracle-verified text
    * operator (shingles, lang-ID, quality, token counts): split on a
    * single literal space, exactly `string_split(text, ' ')` in the
    * DuckDB oracles. Both engines then agree on arbitrary input —
    * runs of spaces / tabs / newlines produce the same (possibly
    * empty-string) tokens on both sides. Do NOT tokenize with an ad-hoc
    * split elsewhere; one tokenizer, one definition. */
  def tokens(c: Column): Column = split(c, " ")

  /** Sliding-window minimum over a string-array column (winnowing
    * kernel) as a native codegen'd expression — see [[SlidingMin]]. */
  def slidingMin(arr: Column, w: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      SlidingMin(org.apache.spark.sql.graftbridge.ColumnBridge.expression(arr), w))

  /** Robust whitespace tokenizer (\s+) for non-oracled paths that want
    * linguistic tokens rather than oracle-bit-exactness. */
  def wsTokens(c: Column): Column = split(c, "\\s+")

  /** Word n-grams over an ALREADY-MATERIALIZED token-array column.
    * Callers must project `tokens(text)` into its own column first:
    * higher-order functions run interpreted, and an inline `split`
    * inside the lambda gets re-evaluated for every element_at — ~6×
    * slower per document. Guarded: Spark's `sequence(1, 0)` would count
    * DOWN, so short inputs explicitly yield an empty array. */
  def wordNgramsOf(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)), i =>
        concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*)))

  /** Convenience for literals/tests; hot paths should materialize the
    * token column and use wordNgramsOf (see scaladoc above). */
  def wordNgrams(c: Column, n: Int): Column = wordNgramsOf(tokens(c), n)
}
