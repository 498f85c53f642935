package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the test star schema.
  *
  * Mirrors the reference's ingest step (crowdsorsa-etl-2023.R:28-32 reads
  * a zipped shapefile into a data frame); here every table is a parquet
  * scan so Catalyst can push filters and prune columns all the way into
  * the file reader — at 100 TB the scan is the dominant cost and
  * pushdown/pruning is what keeps it proportional to the query, not the
  * dataset.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** events.ts arrives in one of two physical layouts depending on the
    * generator: TIMESTAMP(NANOS), which Spark reads as a long (see
    * GraftSession nanosAsLong) and must be truncated ns→µs with integer
    * division (ns epoch values exceed 2^53, so double math would
    * silently lose precision — matches DuckDB's own ns→µs truncation),
    * or native TIMESTAMP(MICROS), which reads as TIMESTAMP_NTZ and only
    * needs the cast to the engine's session-TZ timestamp (identity on
    * the wall clock — GraftSession pins UTC). Branching on the read
    * dtype keeps both layouts oracle-comparable. */
  def events: DataFrame = {
    // defensive: a caller-provided session (driver smoke) may lack the conf
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t("events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")

  /** All tables by name (for SQL-view registration). */
  def all: Map[String, DataFrame] = Map(
    "region" -> region, "nation" -> nation, "customer" -> customer,
    "supplier" -> supplier, "part" -> part, "orders" -> orders,
    "lineitem" -> lineitem, "events" -> events, "documents" -> documents,
    "embeddings" -> embeddings)
}
