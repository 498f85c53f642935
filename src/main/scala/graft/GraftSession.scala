package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Tuned for the driver's local[N] harness but with settings that carry
  * to a multi-executor cluster: AQE (runtime coalescing + skew-join
  * splitting), partial aggregation, parquet filter/column pushdown, and
  * a shuffle-partition count sized to the available parallelism rather
  * than Spark's default 200.
  */
object GraftSession {

  /** Apply graft's standard tuning to an existing builder. */
  def tune(b: SparkSession.Builder, cpus: Int): SparkSession.Builder = b
    .config("spark.sql.shuffle.partitions", cpus.toString)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    // dims (region/nation/customer keys) stay broadcast even at high SF
    .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
    .config("spark.sql.parquet.filterPushdown", "true")
    // events.parquet carries TIMESTAMP(NANOS) which Spark has no native
    // type for; read as long and convert in the loader (Tables.events)
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.parquet.aggregatePushdown", "true")
    // the generated-class cache defaults to 100 entries — a 167-query
    // workload holds several codegen stages per query, so at the
    // default every suite pass EVICTS and recompiles most stages
    // (raising it took the full suite 124.7 s → 98.1 s in round 12).
    // Static conf: must be set before the first session; sized to hold
    // the whole suite's stages. (q_hll_audit's own suite-vs-isolated
    // gap turned out to be the inferred generate filter below — the
    // "isolated 0.31 s" was a warm-cache within-pass rep.)
    .config("spark.sql.codegen.cache.maxEntries", "2000")
    // InferFiltersFromGenerate turns every explode(e) into a pushed
    // pre-filter `size(e) > 0 AND isnotnull(e)` — PushDownPredicates
    // then sinks it BELOW the fan-out exchange, duplicating the
    // generator expression into a filter evaluated twice per row on
    // the narrow pre-spread side. For this engine's n-gram/shingle
    // explodes (interpreted HOF builds: transform + concat_ws +
    // array_distinct) that is catastrophic: the whole pipeline re-runs
    // 2x per document in a single pre-exchange task (single-row-group
    // scans can't split) — measured 7.0 s vs 0.27 s on q_hll_audit's
    // shingle scan at sf0.1 (tools.HllProbe). The rule only ever
    // prunes empty-array rows the Generate itself drops one operator
    // later; every graft explode sits directly above the project that
    // builds its array, so the filter buys nothing at any scale and
    // costs a serial re-evaluation stage. Results are identical with
    // or without the rule (GenerateFilterSpec pins both the plan shape
    // and the row-level equivalence).
    .config("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
    .config("spark.sql.ui.explainMode", "formatted")
    .config("spark.ui.enabled", "false")

  def local(appName: String = "graft",
            cpus: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt): SparkSession = {
    val spark = tune(SparkSession.builder().master(s"local[$cpus]").appName(appName), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
