package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Output-layout sinks. At 100 TB the write layout IS the read plan of
  * every downstream query: partition pruning and bucketed (shuffle-free)
  * joins are decided here.
  */
object TableWriter {

  /** Hive-style partitioned parquet: directory per partition value →
    * downstream filters on the partition column prune entire
    * directories at planning time. */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.partitionBy(cols: _*).mode(SaveMode.Overwrite).parquet(path)

  /** Bucketed + sorted managed table: both sides of a future equi-join
    * bucketed by the key with the same count join with ZERO shuffle
    * (see TableWriterSpec's plan assertion). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, keyCol: String): Unit =
    df.write.bucketBy(buckets, keyCol).sortBy(keyCol)
      .mode(SaveMode.Overwrite).format("parquet").saveAsTable(table)

  def readTable(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
