package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deploy-depth bench for the subword encoders: time the JOIN-based
  * unigram-Viterbi and WordPiece kernels under a production-sized
  * vocabulary (topV real multi-char pieces, padded to `padTo` total
  * rows with never-matching entries — the synthetic corpus saturates
  * below 32k real pieces, and a pad row costs the piece join the
  * identical build-side work). The claim under measurement: per-type
  * probe cost is independent of |V| (the literal-map kernel's
  * GetMapValue is a linear scan of the literal per probe — 32k× the
  * compares at deploy size), so encode time scales with the CORPUS and
  * is near-flat in vocabulary size.
  *
  * Usage: TokenizerBench <topV> <padTo> <dir> [dir2 ...]
  */
object TokenizerBench {
  def main(args: Array[String]): Unit = {
    val topV = args(0).toInt
    val padTo = args(1).toInt
    val dirs = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.GraftSession.tune(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docs(dir: String) = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    def clean(): Unit = {
      graft.CacheRegistry.drain()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }

    val out = dirs.map { dir =>
      val d = docs(dir)
      val nDocs = d.count()
      // warm-up compiles generated code outside the timing
      graft.operators.TextAnalysis
        .unigramEncodeJoinedDocs(d.limit(50), topV = topV, padTo = padTo).count()
      clean()
      val (nU, uniSec) = timed {
        graft.operators.TextAnalysis
          .unigramEncodeJoinedDocs(d, topV = topV, padTo = padTo).count()
      }
      clean()
      graft.operators.TextAnalysis
        .wordpieceEncodeJoinedDocs(d.limit(50), topV = topV, padTo = padTo).count()
      clean()
      val (nW, wpSec) = timed {
        graft.operators.TextAnalysis
          .wordpieceEncodeJoinedDocs(d, topV = topV, padTo = padTo).count()
      }
      clean()
      s"""{"dir":"$dir","docs":$nDocs,"unigram_rows":$nU,"unigram_sec":$uniSec,""" +
        s""""wordpiece_rows":$nW,"wordpiece_sec":$wpSec}"""
    }
    println(s"""{"topV":$topV,"padTo":$padTo,"runs":[${out.mkString(",")}]}""")
    spark.stop()
  }
}
