package graft.tools

import graft.{CacheRegistry, GraftSession}
import graft.CacheRegistry.Tracked
import graft.operators.{Dedup, TextAnalysis}
import graft.functions.TextFunctions
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-by-stage cold/warm profile of q_hll_audit's shingle scan
  * (round-12 verdict item: adjudicate the suite-vs-isolated gap). */
object HllProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables(spark, sfDir)

    def drain(): Unit = {
      CacheRegistry.drain()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    // time the same plan twice back-to-back: first = compile+exec,
    // second = exec only (same cached codegen, caches drained between)
    def timed2(name: String)(mk: => DataFrame): Unit = {
      val r = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = mk.count()
        drain()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[probe] $name%-34s cold=${r(0)._1}%7.3f s warm=${r(1)._1}%7.3f s rows=${r(0)._2}")
    }

    val docs = t.documents.select(col("doc_id"), col("text"))
    timed2("docs scan") { docs }
    timed2("spread only") { Dedup.spread(docs) }
    timed2("tokens size") {
      Dedup.spread(docs).select(size(TextFunctions.tokens(col("text"))).as("n"))
    }
    timed2("ngrams size (no distinct)") {
      Dedup.spread(docs).select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
        .select(size(TextFunctions.wordNgramsOf(col("toks"), 3)).as("n"))
    }
    timed2("ngrams+array_distinct size") {
      Dedup.spread(docs).select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
        .select(size(array_distinct(TextFunctions.wordNgramsOf(col("toks"), 3))).as("n"))
    }
    timed2("shingled+explode") {
      Dedup.shingled(docs, 3).select(explode(col("sh")).as("g"))
    }
    timed2("shingled+explode+distinct") {
      Dedup.shingled(docs, 3).select(explode(col("sh")).as("g")).distinct()
    }
    timed2("full q_hll_audit") { TextAnalysis.hllAudit(t) }
    println("[probe] shingled partitions = " +
      Dedup.shingled(docs, 3).rdd.getNumPartitions)
    timed2("explode after localCheckpoint") {
      Dedup.shingled(docs, 3).localCheckpoint()
        .select(explode(col("sh")).as("g"))
    }
    timed2("explode after persist") {
      val s = Dedup.shingled(docs, 3).persistTracked()
      s.count()
      s.select(explode(col("sh")).as("g"))
    }
    // exchange between array build and explode: does the barrier stop
    // the generator from re-deriving the array expression?
    timed2("explode after repartition") {
      Dedup.shingled(docs, 3).repartition(64)
        .select(explode(col("sh")).as("g"))
    }
    timed2("posexplode variant") {
      Dedup.shingled(docs, 3)
        .select(posexplode(col("sh")).as(Seq("p", "g")))
    }
    timed2("explode_outer + post-filter") {
      Dedup.shingled(docs, 3)
        .select(explode_outer(col("sh")).as("g"))
        .filter(col("g").isNotNull)
    }
    println("=== slow plan ===")
    Dedup.shingled(docs, 3).select(explode(col("sh")).as("g")).explain("formatted")
    println("=== outer plan ===")
    Dedup.shingled(docs, 3).select(explode_outer(col("sh")).as("g"))
      .filter(col("g").isNotNull).explain("formatted")
    spark.stop()
  }
}
