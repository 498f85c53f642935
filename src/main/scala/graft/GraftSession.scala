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
    // default every suite pass EVICTS and recompiles most stages (the
    // committed-vs-suite gap on the wide-expression queries, e.g.
    // q_hll_audit 0.31 s isolated vs 7.4 s in-suite, is Janino
    // recompilation, not execution). Static conf: must be set before
    // the first session; sized to hold the whole suite's stages.
    .config("spark.sql.codegen.cache.maxEntries", "2000")
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
