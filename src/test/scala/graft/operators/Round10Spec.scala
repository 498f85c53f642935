package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project, ResolvedHint, SubqueryAlias}

/** Shared plan-regression guard: no forced broadcast of anything that
  * grows with scale factor.
  *
  * Rule (from the 100 TB audit): an explicit broadcast() hint is
  * allowed ONLY on (a) subtrees whose every leaf is a schema-bounded
  * dim (nation: 25 rows, region: 5 rows — detected by column prefix,
  * the only relations carrying n_/r_ columns), or (b) guaranteed-
  * one-row frames (a global Aggregate with no grouping expressions).
  * customer/supplier/part/filtered-orders and data-dependent aggregate
  * frames (HAVING output, per-key averages/minima) are SF-linear or
  * selectivity-dependent — at the 100 TB target they blow Spark's
  * 8 GB / 512M-row broadcast hard cap, so they must reach AQE
  * unhinted and get sized at runtime. Used by the per-family walks in
  * Round10Spec and Round11Spec.
  */
object PlanGuards {

  /** Hints in the analyzed plan that violate the bounded-build rule. */
  def unboundedHints(df: DataFrame): Seq[String] = {
    @annotation.tailrec
    def root(p: LogicalPlan): LogicalPlan = p match {
      case Project(_, c)       => root(c)
      case SubqueryAlias(_, c) => root(c)
      case other               => other
    }
    df.queryExecution.analyzed.collect { case h: ResolvedHint => h }.flatMap { h =>
      val oneRow = root(h.child) match {
        case a: Aggregate => a.groupingExpressions.isEmpty
        case _            => false
      }
      val leafCols = h.child.collectLeaves().flatMap(_.output.map(_.name))
      val dimOnly = leafCols.nonEmpty &&
        leafCols.forall(n => n.startsWith("n_") || n.startsWith("r_"))
      if (oneRow || dimOnly) None
      else Some(s"hint over ${leafCols.distinct.mkString(",")}")
    }
  }
}

class Round10Spec extends SparkSpec {
  import PlanGuards.unboundedHints

  private val family: Map[String, DataFrame] = {
    val t = tables
    Map(
      "q1"  -> Analytics.q1Agg(t),
      "q3"  -> Analytics.q3Shipping(t),
      "q5"  -> Analytics.q5Local(t),
      "q4"  -> Relational.q4Priority(t),
      "q6"  -> Relational.q6Forecast(t),
      "q12" -> Relational.q12Shipmode(t),
      "q14" -> Relational.q14Promo(t),
      "q7"  -> TpcHShapes.q7Volume(t),
      "q8"  -> TpcHShapes.q8Share(t),
      "q9"  -> TpcHShapes.q9Profit(t),
      "q10" -> TpcHShapes.q10Returns(t),
      "q13" -> TpcHShapes.q13CustDist(t),
      "q15" -> TpcHShapes.q15TopSupp(t),
      "q17" -> TpcHShapes.q17SmallQty(t),
      "q18" -> TpcHShapes.q18BigOrder(t),
      "q19" -> TpcHShapes.q19Disc(t),
      "q21" -> TpcHShapes.q21Waiting(t),
      "q2"  -> TpcHShapes.q2MinCost(t),
      "q11" -> TpcHShapes.q11Important(t),
      "q16" -> TpcHShapes.q16PartSupp(t),
      "q20" -> TpcHShapes.q20Potential(t),
      "q22" -> TpcHShapes.q22Idle(t))
  }

  test("TPC-H family: every broadcast hint is schema-bounded or one-row") {
    val bad = family.toSeq.sortBy(_._1).flatMap { case (name, df) =>
      unboundedHints(df).map(v => s"$name: $v")
    }
    assert(bad.isEmpty, s"SF-linear broadcast hints found:\n${bad.mkString("\n")}")
  }

  test("text family: every broadcast hint is schema-bounded or one-row") {
    // The round-10 stragglers lived here: broadcast(hubs) in
    // decontaminate (hub count linear in corpus size / maxDf) and
    // broadcast(keep) in vocabPrune (vocabulary-sized — Heaps-sublinear
    // but unbounded). Both are de-hinted; this walk closes the CLASS
    // for the whole TextAnalysis-backed registry surface so a future
    // operator can't reintroduce it. The surviving hints in the family
    // (tfIdf's n, invertedIndex's bounds, pmiColloc's nBg) are all
    // grouping-free aggregates — one row by construction.
    val textKeys = Seq("q_langid", "q_quality", "q_tokens", "q_fingerprint",
      "q_pii_redact", "q_tfidf", "q_word_count", "q_inverted_index",
      "q_bigram_lm", "q_dup_spans", "q_lm_novelty", "q_ttr",
      "q_filter_funnel", "q_decontaminate", "q_repetition", "q_pmi_colloc",
      "q_doclen_hist", "q_bpe_pairs", "q_gopher_rules", "q_vocab_prune",
      "q_word_drift", "q_cooc_window", "q_span_corrupt", "q_winnowing")
    val missing = textKeys.filterNot(graft.SparkEntry.queries.contains)
    assert(missing.isEmpty, s"unregistered keys in the walk: $missing")
    val bad = textKeys.flatMap { name =>
      unboundedHints(graft.SparkEntry.queries(name)(spark, sfDir))
        .map(v => s"$name: $v")
    }
    graft.CacheRegistry.drain() // plan building registers tracked persists
    assert(bad.isEmpty, s"SF-linear broadcast hints found:\n${bad.mkString("\n")}")
  }

  test("cache cleanup contract: drain() frees every operator-persisted frame") {
    graft.CacheRegistry.drain()
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    val before = spark.sparkContext.getPersistentRDDs.keySet
    // the four queries the round-9 audit flagged as persist-without-
    // unpersist (plus their registered siblings on the same frames)
    for (name <- Seq("q_dedup_incremental", "q_ann_recall",
        "q_dedup_embed_exact", "q17_smallqty"))
      graft.SparkEntry.queries(name)(spark, sfDir).count()
    assert(graft.CacheRegistry.size > 0, "queries should have tracked caches")
    graft.CacheRegistry.drain()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"cached RDDs survived drain(): $leaked")
    assert(graft.CacheRegistry.size == 0)
  }

  test("keyed drain: interleaved query loops free only their own caches") {
    graft.CacheRegistry.drain()
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    // two query loops interleaving on one driver: each builds (and
    // tracks) its frames under its own withKey scope — the shape the
    // bare drain() would break by freeing the OTHER loop's caches
    val qa = graft.CacheRegistry.withKey("loop-a") {
      graft.SparkEntry.queries("q_dedup_incremental")(spark, sfDir)
    }
    val qb = graft.CacheRegistry.withKey("loop-b") {
      graft.SparkEntry.queries("q_tfidf")(spark, sfDir)
    }
    qa.count(); qb.count()
    val total = graft.CacheRegistry.size
    assert(total >= 2, s"both loops should have tracked caches, size=$total")
    val live0 = spark.sparkContext.getPersistentRDDs.size
    graft.CacheRegistry.drain("loop-a")
    val afterA = graft.CacheRegistry.size
    assert(afterA > 0 && afterA < total,
      s"drain(loop-a) must free only loop-a's frames: $afterA of $total left")
    assert(spark.sparkContext.getPersistentRDDs.size < live0,
      "loop-a's cached RDDs should be gone")
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
      "loop-b's cached RDDs must survive loop-a's drain")
    graft.CacheRegistry.drain("loop-b")
    assert(graft.CacheRegistry.size == 0)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "all tracked caches freed after both keyed drains")
  }

  test("graft_make_valid: null vertices skipped; non-ring argument is an analysis error") {
    graft.functions.GeoFunctions.registerAll(spark)
    val v = spark.sql(
      """SELECT graft_make_valid(array(
        |  named_struct('x', 0.0d, 'y', 0.0d),
        |  cast(null as struct<x:double,y:double>),
        |  named_struct('x', 4.0d, 'y', cast(null as double)),
        |  named_struct('x', 4.0d, 'y', 0.0d),
        |  named_struct('x', 4.0d, 'y', 3.0d),
        |  named_struct('x', 0.0d, 'y', 3.0d))) AS v""".stripMargin)
      .select("v.area", "v.loops").head
    assert(v.getDouble(0) == 12.0 && v.getInt(1) == 1) // nulls dropped, quad intact
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_make_valid(1)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("type"))
  }

  test("jsonl staging dir is fixed and reused, not accumulated per invocation") {
    val tmp = new java.io.File(sys.props("java.io.tmpdir"))
    def staged() = Option(tmp.listFiles((_, n) => n.startsWith("graft-jsonl")))
      .toSeq.flatten.map(_.getName).toSet
    val before = staged()
    graft.sources.JsonLines.roundtrip(tables).count()
    graft.sources.JsonLines.roundtrip(tables).count()
    // two invocations may add exactly ONE dir (the fixed reused path) —
    // the per-call createTempDirectory leak added one per call
    assert(staged() -- before subsetOf Set("graft-jsonl-roundtrip"),
      s"unexpected staging dirs: ${staged() -- before}")
  }

  test("TPC-H family: the de-hinted queries still produce rows at sf0.001") {
    // Semantics guard for the de-hint change itself: the formerly
    // hinted queries must stay non-degenerate (full value parity is
    // the driver's DuckDB gate; q7's nation pair only co-occurs from
    // sf0.01 up, so it is covered there, not here).
    for (name <- Seq("q3", "q5", "q9", "q10", "q14", "q15", "q16", "q18", "q19"))
      assert(family(name).limit(1).count() == 1L, s"$name returned no rows")
  }
}
