package graft.operators

import graft.CacheRegistry.Tracked
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** In-engine quality-classifier TRAINING — the fastText-style
  * distillation loop every production corpus pipeline runs (CCNet
  * §3.3, Dolma's quality filters): a cheap rule labels the corpus, a
  * linear model is trained to mimic the rule, and the model (not the
  * rule) ships because it generalizes and scores in one fused pass.
  * Here the WHOLE loop — feature extraction, standardization, batch
  * gradient descent, scoring — is declarative DataFrame plans, and
  * every arithmetic step is exact BIGINT micro/ppm units so DuckDB
  * replays training bit-for-bit (the q_perplexity discipline applied
  * to model FITTING, not just inference).
  *
  * Model: logistic regression with the HARD sigmoid
  * `clamp(1/2 + z/4, 0, 1)` (Collobert 2004's segment approximation
  * — rational, hence exact in integers; the smooth sigmoid's exp()
  * has no cross-engine bit contract). Features are standardized by
  * mean absolute deviation (integer-exact; an stddev would need
  * sqrt, whose FLOOR at perfect-square boundaries is a cross-engine
  * hazard). Six full-batch GD epochs, lr = 32, all divisions
  * explicit FLOOR division on signed values via the shared
  * `(a - ((a%b)+b)%b) / b` identity (Spark DIV truncates toward
  * zero, DuckDB // floors — the identity makes both exact-divide a
  * floor-adjusted numerator, so they agree on every sign).
  *
  * Measured at sf0.01: train agreement 0.702 vs the float-logistic
  * ceiling 0.75 on the same features (the axis-aligned AND rule is
  * not linearly separable — the gap is model class, not the integer
  * arithmetic; majority-class floor 0.58).
  *
  * Scale: per epoch ONE corpus-wide partial aggregate (5 bigint sums,
  * map-side combined) + a 1-row broadcast back — the classic
  * data-parallel GD layout (one "allreduce" per epoch, gradient-sized,
  * never corpus-sized). The feature frame is computed once and
  * persisted across epochs. Overflow bound: |Σ x·(p−y)| < n·10¹²,
  * exact to ~9M docs per aggregation; beyond that the sums move to
  * DECIMAL(38) — documented, not hit at any registered SF. */
object QualityModel {

  private val Stops = "('the','and','of','to','a')"
  private val Epochs = 6
  private val LrNum = 64L // lr = 64/2 = 32

  /** FLOOR division of signed bigints, identical semantics in Spark
    * (`DIV`, truncating) and DuckDB (`//`, flooring): subtract the
    * nonnegative remainder first so the division is exact. */
  private def fdiv(a: String, b: String, div: String): String =
    s"((($a) - (((($a) % ($b)) + ($b)) % ($b))) $div ($b))"

  private def zSel(prefix: String = ""): String =
    (0 to 4).map(j => s"${prefix}w$j*x$j").mkString(" + ")

  /** z with the round's weights baked in as LITERALS — the q_kmeans
    * rule: per-epoch state is 5 longs (BOUNDED, broadcast-dim class),
    * collected and folded into the next epoch's expression, so each
    * epoch is ONE job over the cached feature frame instead of a
    * lineage that re-evaluates every prior epoch (the un-materialized
    * chain was O(epochs²) plan evaluations — measured 9.2 s at sf0.1,
    * now ~1 s). The DuckDB oracle keeps the chained-CTE form: same
    * integers, materialization is an engine concern. */
  private def zLit(w: Array[Long]): String =
    (0 to 4).map(j => s"(${w(j)}L)*x$j").mkString(" + ")

  /** Hard sigmoid in micro units. `lit` suffixes bigint literals for
    * the Spark dialect ("L") and leaves them bare for DuckDB. */
  private def pSel(div: String): String = {
    val l = if (div == "//") "" else "L"
    s"LEAST(1000000$l, GREATEST(0$l, 500000$l + ${fdiv("z", s"4000000$l", div)}))"
  }

  /** The standardized feature frame f(doc_id, lang, y, x0..x4) and the
    * trained weights. Everything downstream of the raw text pass is
    * skinny: mu/md are 1-row broadcast aggregate frames; per-epoch
    * weight state is 5 longs collected to the driver and folded back
    * as literals ([[zLit]]). */
  private def parts(t: Tables): (DataFrame, Array[Long]) = {
    val d = "DIV"
    val raw = t.documents.filter(length(col("text")) >= 1).selectExpr(
      "doc_id", "lang",
      "CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens",
      s"(CAST(size(filter(split(text, ' '), t -> t IN $Stops)) AS BIGINT)*1000000L) DIV CAST(size(split(text, ' ')) AS BIGINT) AS stop_ppm",
      "(CAST(size(array_distinct(split(text, ' '))) AS BIGINT)*1000000L) DIV CAST(size(split(text, ' ')) AS BIGINT) AS ttr_ppm",
      "(CAST(length(text) AS BIGINT)*1000000L) DIV CAST(size(split(text, ' ')) AS BIGINT) AS ml")
    val f0 = raw.selectExpr("doc_id", "lang",
      "CASE WHEN n_tokens>=25 AND stop_ppm>=30000 AND ttr_ppm>=400000 THEN 1L ELSE 0L END AS y",
      "LEAST(n_tokens, 200L)*5000L AS r1",
      "stop_ppm AS r2",
      "ttr_ppm AS r3",
      "(LEAST(GREATEST(ml, 4000000L), 8000000L)-4000000L) DIV 4L AS r4")
      .persistTracked() // mu, md AND f read it — one text pass, not three
    val mu = f0.agg(expr("COUNT(*)").as("n"),
      (1 to 4).map(j => expr(fdiv(s"SUM(r$j)", "COUNT(*)", d)).as(s"m$j")): _*)
    val md = f0.crossJoin(broadcast(mu)).agg(
      expr(s"GREATEST(1L, ${fdiv("SUM(ABS(r1-m1))", "MIN(n)", d)})").as("d1"),
      (2 to 4).map(j =>
        expr(s"GREATEST(1L, ${fdiv(s"SUM(ABS(r$j-m$j))", "MIN(n)", d)})").as(s"d$j")): _*)
    val f = f0.crossJoin(broadcast(mu)).crossJoin(broadcast(md)).selectExpr(
      Seq("doc_id", "lang", "y", "250000L AS x0") ++
        (1 to 4).map(j =>
          s"LEAST(1000000L, GREATEST(-1000000L, ${fdiv(s"(r$j-m$j)*1000000L", s"4L*d$j", d)})) AS x$j"): _*)
      .persistTracked()
    var w = Array.fill(5)(0L)
    for (_ <- 1 to Epochs) {
      val scored = f.withColumn("z", expr(zLit(w)))
        .withColumn("p", expr(pSel(d)))
      val a = scored.agg(
        expr(fdiv("SUM(x0*(p - y*1000000L))", "COUNT(*)", d)).as("a0"),
        (1 to 4).map(j =>
          expr(fdiv(s"SUM(x$j*(p - y*1000000L))", "COUNT(*)", d)).as(s"a$j")): _*)
        .collect().head // 5 longs — bounded driver state per epoch
      // lr step in exact FLOOR division (Math.floorDiv ≡ the SQL fdiv)
      w = w.zipWithIndex.map { case (wj, j) =>
        wj - Math.floorDiv(LrNum * a.getLong(j), 2000000L) }
    }
    (f, w)
  }

  private def finalScored(t: Tables): (DataFrame, Array[Long]) = {
    val (f, w) = parts(t)
    (f.withColumn("z", expr(zLit(w))).withColumn("p", expr(pSel("DIV"))), w)
  }

  /** One-row training report: corpus size, the confusion matrix of the
    * trained classifier against its own distillation labels, and the
    * final weights — the artifact a scoring job broadcasts. */
  def logregTrain(t: Tables): DataFrame = {
    val (pf, w) = finalScored(t)
    pf.agg(
      expr("COUNT(*)").as("n_docs"),
      expr("SUM(CASE WHEN p >= 500000L AND y = 1L THEN 1L ELSE 0L END)").as("tp"),
      expr("SUM(CASE WHEN p >= 500000L AND y = 0L THEN 1L ELSE 0L END)").as("fp"),
      expr("SUM(CASE WHEN p <  500000L AND y = 0L THEN 1L ELSE 0L END)").as("tn"),
      expr("SUM(CASE WHEN p <  500000L AND y = 1L THEN 1L ELSE 0L END)").as("fn"))
      .selectExpr(Seq("n_docs", "tp", "fp", "tn", "fn") ++
        (0 to 4).map(j => s"(${w(j)}L) AS w$j"): _*)
  }

  /** Per-language scoring report of the trained classifier: how many
    * documents the model keeps vs the rule, and their agreement — the
    * per-slice audit that catches a filter model quietly dropping one
    * language (the CCNet per-language failure mode). */
  def logregScore(t: Tables): DataFrame =
    finalScored(t)._1
      .selectExpr("lang", "y",
        "CASE WHEN p >= 500000L THEN 1L ELSE 0L END AS pred")
      .groupBy(col("lang"))
      .agg(
        expr("COUNT(*)").as("n_docs"),
        expr("SUM(pred)").as("n_keep_model"),
        expr("SUM(y)").as("n_keep_rule"),
        expr("SUM(CASE WHEN pred = y THEN 1L ELSE 0L END)*1000000L DIV COUNT(*)")
          .as("agree_ppm"))
      .orderBy(col("lang"))

  /** The DEPLOYMENT composition: train, then FILTER the corpus by
    * model score and dedup the survivors exactly — the
    * classifier-gated curation pass a production pipeline ships
    * (model quality gate → md5 exact dedup → per-source yield). One
    * corpus pass for features, the epochs' gradient aggregates, then
    * one filter+dedup pass: the model application itself is pure
    * map-side (5 multiplies per row against literal weights). */
  def logregFilter(t: Tables): DataFrame = {
    val (pf, _) = finalScored(t)
    val kept = pf.filter(expr("p >= 500000L"))
      .join(t.documents.select(col("doc_id"), col("text"), col("source")),
        Seq("doc_id"))
    kept.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"), min(col("source")).as("source"),
        count(lit(1)).as("n_copies"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_unique"),
        expr("SUM(n_copies)").as("n_kept"),
        min(col("doc_id")).as("first_doc"))
      .orderBy(col("source"))
  }

  // ——— DuckDB oracle (generated from the same fragments) ———

  private def oracleCtes: String = {
    val d = "//"
    def fd(a: String, b: String) = fdiv(a, b, d)
    val feats = s"""raw AS MATERIALIZED (
      |  SELECT doc_id, lang,
      |    len(string_split(text,' ')) AS n_tokens,
      |    (len(list_filter(string_split(text,' '), t -> t IN $Stops))*1000000)
      |      // len(string_split(text,' ')) AS stop_ppm,
      |    (len(list_distinct(string_split(text,' ')))*1000000) // len(string_split(text,' ')) AS ttr_ppm,
      |    (length(text)*1000000) // len(string_split(text,' ')) AS ml
      |  FROM documents WHERE length(text) >= 1),
      |f0 AS MATERIALIZED (
      |  SELECT doc_id, lang,
      |    CASE WHEN n_tokens>=25 AND stop_ppm>=30000 AND ttr_ppm>=400000 THEN 1 ELSE 0 END AS y,
      |    LEAST(n_tokens,200)*5000 AS r1,
      |    stop_ppm AS r2,
      |    ttr_ppm AS r3,
      |    (LEAST(GREATEST(ml,4000000),8000000)-4000000)//4 AS r4
      |  FROM raw),
      |mu AS MATERIALIZED (SELECT COUNT(*) AS n, ${(1 to 4).map(j =>
             fd(s"SUM(r$j)", "COUNT(*)") + s" AS m$j").mkString(", ")} FROM f0),
      |md AS MATERIALIZED (SELECT ${(1 to 4).map(j =>
             s"GREATEST(1, ${fd(s"SUM(ABS(r$j-m$j))", "MIN(n)")}) AS d$j").mkString(", ")} FROM f0, mu),
      |f AS MATERIALIZED (SELECT doc_id, lang, y, CAST(250000 AS BIGINT) AS x0,
      |  ${(1 to 4).map(j =>
             s"LEAST(1000000, GREATEST(-1000000, ${fd(s"(r$j-m$j)*1000000", s"4*d$j")})) AS x$j").mkString(", ")}
      |  FROM f0, mu, md)""".stripMargin
    val w0 = s"w0_ AS (SELECT ${(0 to 4).map(j => s"CAST(0 AS BIGINT) AS w$j").mkString(", ")})"
    val epochs = (1 to Epochs).map { e =>
      val prev = if (e == 1) "w0_" else s"w${e - 1}_"
      s"""p$e AS MATERIALIZED (SELECT f.*, ${pSel(d)} AS p
         |  FROM (SELECT f.*, ${zSel(prev + ".")} AS z FROM f, $prev) f),
         |g$e AS MATERIALIZED (SELECT ${(0 to 4).map(j =>
              fd(s"SUM(x$j*(p - y*1000000))", "COUNT(*)") + s" AS a$j").mkString(", ")} FROM p$e),
         |w${e}_ AS MATERIALIZED (SELECT ${(0 to 4).map(j =>
              s"$prev.w$j - ${fd(s"${LrNum}*a$j", "2000000")} AS w$j").mkString(", ")} FROM g$e, $prev)""".stripMargin
    }.mkString(",\n")
    val last = s"w${Epochs}_"
    s"""$feats,
       |$w0,
       |$epochs,
       |pf AS MATERIALIZED (SELECT f.*, ${pSel(d)} AS p
       |  FROM (SELECT f.*, ${zSel(last + ".")} AS z FROM f, $last) f)""".stripMargin
  }

  def oracleTrainSql: String = {
    val last = s"w${Epochs}_"
    s"""WITH $oracleCtes
       |SELECT (SELECT COUNT(*) FROM pf) AS n_docs,
       |  CAST(SUM(CASE WHEN p >= 500000 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |  CAST(SUM(CASE WHEN p >= 500000 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |  CAST(SUM(CASE WHEN p <  500000 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
       |  CAST(SUM(CASE WHEN p <  500000 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       |  ${(0 to 4).map(j => s"CAST((SELECT w$j FROM $last) AS BIGINT) AS w$j").mkString(", ")}
       |FROM pf""".stripMargin
  }

  def oracleScoreSql: String =
    s"""WITH $oracleCtes
       |SELECT lang, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN p >= 500000 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep_model,
       |  CAST(SUM(y) AS BIGINT) AS n_keep_rule,
       |  CAST(SUM(CASE WHEN (CASE WHEN p >= 500000 THEN 1 ELSE 0 END) = y THEN 1 ELSE 0 END)*1000000 // COUNT(*) AS BIGINT) AS agree_ppm
       |FROM pf GROUP BY lang ORDER BY lang""".stripMargin

  /** Isotonic (pool-adjacent-violators) probability CALIBRATION — the
    * step between a quality score and a keep/drop threshold: raw
    * scores are not probabilities, so production pipelines calibrate
    * them against a trusted label before thresholding (Zadrozny &
    * Elkan KDD'02). Here the stopword-ppm score is calibrated against
    * the lang='en' label over B=16 FIXED-WIDTH score bins, and the
    * monotone fit uses the closed form of isotonic regression:
    * iso(k) = max_{i≤k} min_{j≥k} mean(y, bins i..j) — evaluated as
    * two nested aggregations over the B³/2 (i,k,j) triples of a
    * 16-row frame.
    *
    * Determinism: bin populations and positives are exact BIGINTs;
    * each candidate mean is ONE IEEE division of exact integers, and
    * min/max over identical double sets are bit-identical across
    * engines — no rounding needed (calib_ppm = floor(calib·10⁶) is
    * derived from those identical doubles).
    *
    * Scale: the corpus pass is one map-side scan into a ≤B-row
    * aggregate (fixed-width binning needs NO global sort, unlike
    * ntile); everything after is arithmetic on a 16-row frame —
    * broadcast joins, zero wide shuffles. The fitted step function
    * deploys as a broadcast piecewise-constant map join. */
  def calibrate(t: Tables): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val B = 16
    val toks = graft.functions.TextFunctions.tokens(col("text"))
    val base = t.documents
      .select(col("doc_id"), col("lang"),
        size(filter(toks, w => w.isInCollection(
          Seq("the", "and", "of", "to", "a")))).cast("long").as("n_stop"),
        size(toks).cast("long").as("n_tok"))
      .filter(col("n_tok") > 0)
      .withColumn("score", expr("CAST((n_stop * 1000000) DIV n_tok AS BIGINT)"))
      // fixed-width bins over the score's MEANINGFUL range (stopword
      // ratios live well under 25%); the top bin absorbs the tail
      .withColumn("bin", expr(s"CAST(LEAST((score * $B) DIV 250001, ${B - 1}) AS BIGINT)"))
      .withColumn("y", when(col("lang") === "en", 1L).otherwise(0L))
    val g = base.groupBy(col("bin"))
      .agg(count(lit(1)).cast("long").as("w"), sum(col("y")).cast("long").as("s"),
        min(col("score")).as("score_lo"), max(col("score")).as("score_hi"))
    // ≤16 rows from here — the single-partition window is a constant-size frame
    val win = Window.orderBy(col("bin"))
    val r = g.withColumn("r", row_number().over(win))
      .withColumn("ps", sum(col("s")).over(win))
      .withColumn("pw", sum(col("w")).over(win))
    val lo = r.select(col("r").as("ri"),
      (col("ps") - col("s")).as("psi"), (col("pw") - col("w")).as("pwi"))
    val hi = r.select(col("r").as("rj"), col("ps").as("psj"), col("pw").as("pwj"))
    val pairs = lo.join(hi, col("ri") <= col("rj"))
      .select(col("ri"), col("rj"),
        ((col("psj") - col("psi")).cast("double") /
          (col("pwj") - col("pwi")).cast("double")).as("a"))
    val k = r.select(col("r").as("rk"), col("bin"), col("w"), col("s"),
      col("score_lo"), col("score_hi"))
    pairs.join(k, col("ri") <= col("rk") && col("rk") <= col("rj"))
      .groupBy(col("rk"), col("bin"), col("w"), col("s"),
        col("score_lo"), col("score_hi"), col("ri"))
      .agg(min(col("a")).as("m"))
      .groupBy(col("rk"), col("bin"), col("w"), col("s"),
        col("score_lo"), col("score_hi"))
      .agg(max(col("m")).as("calib"))
      .select(col("bin"), col("w").as("n"), col("s").as("pos"),
        col("score_lo"), col("score_hi"),
        (col("s").cast("double") / col("w").cast("double")).as("raw_rate"),
        col("calib"),
        floor(col("calib") * lit(1000000d)).cast("long").as("calib_ppm"))
      .orderBy(col("bin"))
  }

  def oracleCalibrateSql: String =
    """WITH base AS (
      |  SELECT doc_id, lang,
      |    len(list_filter(string_split(text, ' '),
      |        t -> t IN ('the','and','of','to','a'))) AS n_stop,
      |    len(string_split(text, ' ')) AS n_tok
      |  FROM documents),
      |sc AS (SELECT *, CAST(n_stop * 1000000 // n_tok AS BIGINT) AS score,
      |         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      |       FROM base WHERE n_tok > 0),
      |b AS (SELECT CAST(LEAST(score * 16 // 250001, 15) AS BIGINT) AS bin,
      |        COUNT(*) AS w, SUM(y) AS s,
      |        MIN(score) AS score_lo, MAX(score) AS score_hi
      |      FROM sc GROUP BY 1),
      |r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY bin) AS r,
      |        SUM(s) OVER (ORDER BY bin) AS ps,
      |        SUM(w) OVER (ORDER BY bin) AS pw FROM b),
      |pairs AS (SELECT i.r AS ri, j.r AS rj,
      |        CAST(j.ps - (i.ps - i.s) AS DOUBLE)
      |          / CAST(j.pw - (i.pw - i.w) AS DOUBLE) AS a
      |      FROM r i JOIN r j ON i.r <= j.r),
      |mki AS (SELECT k.r AS rk, k.bin, k.w, k.s, k.score_lo, k.score_hi,
      |          p.ri, MIN(p.a) AS m
      |        FROM pairs p JOIN r k ON p.ri <= k.r AND k.r <= p.rj
      |        GROUP BY 1,2,3,4,5,6,7),
      |iso AS (SELECT rk, bin, w, s, score_lo, score_hi, MAX(m) AS calib
      |        FROM mki GROUP BY 1,2,3,4,5,6)
      |SELECT bin, CAST(w AS BIGINT) AS n, CAST(s AS BIGINT) AS pos,
      |  CAST(score_lo AS BIGINT) AS score_lo,
      |  CAST(score_hi AS BIGINT) AS score_hi,
      |  CAST(s AS DOUBLE) / CAST(w AS DOUBLE) AS raw_rate,
      |  calib,
      |  CAST(floor(calib * 1000000) AS BIGINT) AS calib_ppm
      |FROM iso ORDER BY bin""".stripMargin

  def oracleFilterSql: String =
    s"""WITH $oracleCtes,
       |kept AS (SELECT pf.doc_id, d.text, d.source
       |         FROM pf JOIN documents d ON pf.doc_id = d.doc_id
       |         WHERE p >= 500000),
       |ex AS (SELECT md5(text) AS h, MIN(doc_id) AS doc_id,
       |         MIN(source) AS source, COUNT(*) AS n_copies
       |       FROM kept GROUP BY md5(text))
       |SELECT source, COUNT(*) AS n_unique,
       |  CAST(SUM(n_copies) AS BIGINT) AS n_kept,
       |  MIN(doc_id) AS first_doc
       |FROM ex GROUP BY source ORDER BY source""".stripMargin
}
