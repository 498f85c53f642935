package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** VERDICT r13 item 4: measure the suffix-array depth ceiling so a
  * 100 TB operator can choose exact-SA vs shingle dedup from data, not
  * prose. Runs [[graft.operators.SuffixArray.repeatedSpansDocs]] over
  * the FULL corpus (no 20% slice) at a given doubling depth, and
  * reports wall seconds, total chars, MEASURED shuffle write bytes
  * (stage-accumulated), and the scaladoc's a-priori wire estimate
  * (~20 B/char/round: three (doc,off,rank)-triple shuffles per round).
  *
  * Usage: SaDepthProbe <sfDir> <rounds> [reps]
  * Prints one JSON line per rep plus a `min` summary.
  */
object SaDepthProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val rounds = args(1).toInt
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.tune(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(
          s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten): Unit
    })

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val nChars = docs.agg(sum(length(col("text")))).head.getLong(0)
    val est = nChars * 20L * rounds

    var best = Double.MaxValue
    var bestBytes = 0L
    for (r <- 1 to reps) {
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      val n = graft.operators.SuffixArray.repeatedSpansDocs(docs, rounds).count()
      val secs = (System.nanoTime() - t0) / 1e9
      val sb = shuffleBytes.get()
      println(f"""{"rep":$r,"rounds":$rounds,"n_chars":$nChars,"secs":$secs%.2f,"spans":$n,"shuffle_bytes":$sb,"est_bytes":$est}""")
      if (secs < best) { best = secs; bestBytes = sb }
    }
    println(f"""{"metric":"sa_depth","rounds":$rounds,"n_chars":$nChars,"min_secs":$best%.2f,"shuffle_bytes":$bestBytes,"est_bytes":$est,"sf_dir":"$dir"}""")
    spark.stop()
  }
}
