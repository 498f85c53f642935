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
