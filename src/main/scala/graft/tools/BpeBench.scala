package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bench tooling for the BPE tokenizer lifecycle at PRODUCTION merge
  * counts: train a `rounds`-merge vocabulary on one corpus, then time
  * ENCODE under that fixed artifact on one or more corpora. The claim
  * under measurement is the round-12 fix: merge application is a
  * checkpointed fold with bounded expression depth, so encode survives
  * rounds ≫ the registered 4 (the round-11 `weak`: the unchecked fold
  * died in the analyzer long before a real 32k-merge vocabulary) and
  * its cost scales with the CORPUS (one (doc,tok) partial count + a
  * vocab-sized join), not with rounds × corpus.
  *
  * Usage: BpeBench <trainDir> <rounds> <encodeDir> [encodeDir2 ...]
  *
  * SPARK_GRAFT_BPE_PAD_TO=N pads the learned list to N merges with
  * never-firing entries. The synthetic corpus's merge sequence
  * SATURATES (~89 merges fully merge every word type), so production
  * depth can't be reached with real merges here — a padded merge
  * costs the identical per-merge expression work (the `when`
  * condition evaluates false through the same codegen), so the padded
  * timing is the honest production-depth measurement.
  */
object BpeBench {
  def main(args: Array[String]): Unit = {
    val trainDir = args(0)
    val rounds = args(1).toInt
    val padTo = sys.env.get("SPARK_GRAFT_BPE_PAD_TO").map(_.toInt).getOrElse(0)
    val encodeDirs = args.drop(2).toSeq
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

    val (learned, trainSec) = timed {
      graft.operators.TextAnalysis.bpeTrainDocs(docs(trainDir), rounds)
        .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    }
    graft.CacheRegistry.drain()
    val merges = learned ++
      (learned.length until padTo).map(i => (s" pad$i", " "))
    val encodes = encodeDirs.map { dir =>
      val d = docs(dir)
      val nDocs = d.count()
      // warm-up run compiles the fold's generated code outside the timing
      graft.operators.TextAnalysis.bpeEncodeDocs(d.limit(50), merges).count()
      graft.CacheRegistry.drain()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      val (n, sec) = timed {
        graft.operators.TextAnalysis.bpeEncodeDocs(d, merges).count()
      }
      graft.CacheRegistry.drain()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      s"""{"dir":"$dir","docs":$nDocs,"rows":$n,"encode_sec":$sec}"""
    }
    println(s"""{"train_dir":"$trainDir","rounds":$rounds,""" +
      s""""merges_learned":${learned.length},"merges_applied":${merges.length},""" +
      s""""train_sec":$trainSec,"encodes":[${encodes.mkString(",")}]}""")
    spark.stop()
  }
}
