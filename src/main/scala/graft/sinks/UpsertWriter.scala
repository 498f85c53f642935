package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Merge-by-key upsert into a parquet table (no lakehouse dependency):
  * read base ∪ updates, keep the newest version per key, rewrite.
  *
  * The reference's warehouse push is effectively an upsert — re-pushing
  * a documentId replaces the previous version server-side; this is the
  * self-hosted analog. Version resolution is a window max per key (one
  * shuffle over base+updates). At 100 TB the rewrite would target only
  * affected partitions (partition-pruned read + dynamic overwrite);
  * here the table is rewritten whole for simplicity.
  */
object UpsertWriter {

  /** Write the initial table. */
  def init(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** Merge `updates` into the table at `path`: rows whose `keyCol`
    * matches an existing row replace it when their `versionCol` is
    * newer; new keys are inserted. Ties between base and update keep
    * the update (source=1); ties among duplicate keys *within* the
    * updates at the same version are broken by a content hash of the
    * whole row, so the survivor is deterministic regardless of
    * partitioning or run order.
    *
    * Directory swap is crash-ordered: the new table is fully written
    * to `_merge_tmp`, the old directory is renamed aside to `_old`,
    * tmp is renamed into place, and only then is `_old` deleted — at
    * every intermediate point a complete copy of the data exists under
    * `path`, `path_old`, or `_merge_tmp`. NOTE: the swap uses
    * java.nio renames, i.e. this sink targets a LOCAL (or NFS-mounted)
    * filesystem; an object-store deployment would swap via a Hadoop
    * FileSystem rename or, better, a partition-level dynamic overwrite. */
  def merge(spark: SparkSession, updates: DataFrame, path: String,
            keyCol: String, versionCol: String): Unit = {
    val base = spark.read.parquet(path).withColumn("_src", lit(0))
    val up = updates.withColumn("_src", lit(1))
    val contentCols = base.columns.filterNot(_ == "_src").sorted.map(col).toSeq
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(versionCol).desc, col("_src").desc, xxhash64(contentCols: _*))
    val merged = base.unionByName(up)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_src")
    // the source parquet can't be overwritten while it's being read:
    // write distributed to a temp dir, then swap directories (metadata
    // ops only — no data moves through the driver)
    val tmp = path + "_merge_tmp"
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    val p = java.nio.file.Paths.get(path)
    val pt = java.nio.file.Paths.get(tmp)
    val pOld = java.nio.file.Paths.get(path + "_old")
    def rmRec(d: java.nio.file.Path): Unit = if (java.nio.file.Files.exists(d)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(d).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
    rmRec(pOld)                         // leftover from a previous crash
    java.nio.file.Files.move(p, pOld)   // old data set aside, not deleted
    java.nio.file.Files.move(pt, p)     // new data live
    rmRec(pOld)                         // old copy dropped last
  }
}
