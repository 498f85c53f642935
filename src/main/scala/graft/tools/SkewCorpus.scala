package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bench tooling: synthesize a SKEWED documents corpus — `dupShare` of
  * the docs are copies of one boilerplate string (the giant band
  * bucket), the rest unique — the corpus shape `q_dedup_minhash_cap`
  * exists for (DedupSkewSpec's fixture, at bench scale). ScaleUp can't
  * produce this: its copies are structurally independent by design, so
  * no bucket ever grows with the factor; here the hot bucket IS the
  * thing that grows.
  *
  * doc_ids are xxhash64-scattered (shuffle-partition sizes reflect row
  * counts, not delta-compressible sequential ids); schema matches the
  * driver's documents.parquet so SparkEntry queries run unchanged.
  *
  * Usage: SkewCorpus <outDir> <nDocs> <dupShare>
  */
object SkewCorpus {
  def main(args: Array[String]): Unit = {
    val (out, n, dupShare) = (args(0), args(1).toLong, args(2).toDouble)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.GraftSession.tune(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dups = (n * dupShare).toLong
    val boiler = "subscribe to our newsletter for updates terms of " +
      "service apply all rights reserved contact us for more information"
    spark.range(n).select(
        xxhash64(col("id")).as("doc_id"),
        when(col("id") < dups, lit(boiler))
          .otherwise(concat_ws(" ",
            (0 until 12).map(i =>
              concat(lit("w"), ((col("id") * 131 + i * 7919) % 999983L)
                .cast("string"))): _*)).as("text"),
        lit("en").as("lang"),
        lit("skew").as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$out/documents.parquet")
    println(s"skew corpus: $n docs, $dups boilerplate copies -> $out")
    spark.stop()
  }
}
