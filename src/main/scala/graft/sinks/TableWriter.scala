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

  /** Z-ordered rewrite: cluster rows by the Morton code of `dims` so
    * every output file covers a compact hyper-rectangle of the dim
    * space — min/max footer stats then prune files for range filters
    * on ANY of the dims, not just the leading sort key. One skinny
    * stats aggregate + one range shuffle on `_z`. */
  def writeZOrdered(df: DataFrame, path: String, dims: Seq[String],
                    files: Int): Unit =
    graft.functions.ZOrder.withZ(df, dims)
      .repartitionByRange(files, org.apache.spark.sql.functions.col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Small-file compaction — the table-maintenance pass every
    * long-running 100 TB lake needs: streaming/micro-batch appends and
    * over-parallel writes leave thousands of KB-sized files whose
    * per-file open/footer cost dominates scans. Rewrites a parquet
    * directory into ~`targetBytes`-sized files (computed from the
    * CURRENT on-disk size, so already-compacted data is a no-op
    * rewrite), sorted within files by `sortCols` so min/max row-group
    * stats stay selective for data-skipping readers. Writes to a
    * temp sibling then swaps, so a crashed compaction never corrupts
    * the live directory (readers see old or new, not a mix). */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L << 20,
              sortCols: Seq[String] = Nil): Long = {
    val dir = new java.io.File(path)
    val bytes = Option(dir.listFiles()).toSeq.flatten
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(_.length()).sum
    val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(path)
    val out = if (sortCols.nonEmpty)
      df.repartition(nFiles).sortWithinPartitions(sortCols.map(org.apache.spark.sql.functions.col): _*)
    else df.coalesce(nFiles)
    val tmp = path.stripSuffix("/") + ".compact-tmp"
    out.write.mode(SaveMode.Overwrite).parquet(tmp)
    // atomic-ish swap: rename live -> trash, tmp -> live, drop trash
    val trash = new java.io.File(path.stripSuffix("/") + ".compact-old")
    def delete(f: java.io.File): Unit = {
      Option(f.listFiles()).toSeq.flatten.foreach(delete); f.delete(): Unit
    }
    delete(trash)
    if (!dir.renameTo(trash) || !new java.io.File(tmp).renameTo(dir))
      throw new java.io.IOException(s"compact swap failed for $path")
    delete(trash)
    nFiles.toLong
  }
}
