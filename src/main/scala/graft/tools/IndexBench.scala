package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bench tooling for the stored MinHash index (operators.DedupIndex):
  * time the one-off index WRITE over a corpus, then the recurring
  * batch PROBE against it — the deployment claim under measurement is
  * that probe cost is dominated by O(batch) fresh work (batch shingles
  * + signatures + skinny bucketed joins), so growing the CORPUS 10×
  * must not grow probe time anywhere near 10× (the index side is
  * scanned in place, never shuffled; only its scan I/O grows).
  *
  * Usage: IndexBench <corpusDir> <batchDir> <prefix>
  *   corpusDir/documents.parquet → index build side
  *   batchDir/documents.parquet, doc_id % 10 == 0 → fixed probe batch
  *     (hold batchDir constant across corpus sizes so the probe's
  *     fresh-work term is identical and only the corpus term varies)
  */
object IndexBench {
  def main(args: Array[String]): Unit = {
    val (corpusDir, batchDir, prefix) = (args(0), args(1), args(2))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = graft.GraftSession.tune(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val corpus = spark.read.parquet(s"$corpusDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val batch = spark.read.parquet(s"$batchDir/documents.parquet")
      .filter(col("doc_id") % 10 === 0).select(col("doc_id"), col("text"))
    val (nCorpus, nBatch) = (corpus.count(), batch.count())

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val writeSec = timed {
      graft.operators.DedupIndex.writeIndex(corpus, prefix)
    }
    graft.CacheRegistry.drain()

    def runProbe(): Long = {
      val n = graft.operators.DedupIndex.probe(spark, batch, prefix).count()
      graft.CacheRegistry.drain()
      spark.catalog.clearCache()
      n
    }
    val pairs = runProbe() // warm-up: codegen + parquet footer caches
    val probeSec = (1 to reps).map(_ => timed(runProbe())).min
    println(s"""{"corpus":"$corpusDir","corpus_docs":$nCorpus,""" +
      s""""batch_docs":$nBatch,"pairs":$pairs,""" +
      s""""index_write_sec":$writeSec,"probe_sec":$probeSec}""")
    spark.stop()
  }
}
