package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Candidate-set evidence for the bitext IVF twin's sub-quadratic
  * claim: counts the pairs each path actually SCORES at a scale —
  * dense = |X|·|Y| by construction; IVF = the probe×cell equi-join
  * size. Usage: BitextProbe <sfDir> */
object BitextProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.tune(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = graft.sources.Tables(spark, dir)
    val sweepOnly = args.length > 2 && args(2) == "sweep"
    if (!sweepOnly) recallProbe(t, dir)

    // nlist sweep: probe-ASSIGNMENT cost, flat vs two-level, at a 10×
    // cell-count step — the r15 evidence that the two-level quantizer
    // is sub-linear in nlist where the flat cross is linear (i.e.
    // quadratic in the corpus once nlist is occupancy-scaled).
    import graft.operators.Similarity
    val nBase = if (args.length > 1) args(1).toInt else 100
    val corpus = t.embeddings
    val queries = t.embeddings.filter(col("vec_id") < 2000)
      .select(col("vec_id").as("query_id"),
        transform(col("embedding"), _.cast("double")).as("qv"))
    queries.persist(); queries.count()
    for (nlist <- Seq(nBase, 10 * nBase)) {
      val (aF, cents) = Similarity.ivfAssign(corpus, nlist, iters = 1)
      aF.count(); cents.count() // index built before the probe clock starts
      val t0 = System.nanoTime()
      val probeW = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id")).orderBy(col("csim").desc, col("bucket"))
      val flatN = queries.crossJoin(broadcast(cents))
        .withColumn("csim", Similarity.cosine(col("qv"), col("centroid")))
        .withColumn("prn", row_number().over(probeW)).filter(col("prn") <= 6)
        .count()
      val flatSec = (System.nanoTime() - t0) / 1e9
      val (aT, cells, supers) = Similarity.twoLevelAssign(corpus, nlist, iters = 1)
      aT.count(); cells.count(); supers.count()
      val t1 = System.nanoTime()
      val twoN = Similarity.twoLevelProbe(queries, supers, cells, 4, 6).count()
      val twoSec = (System.nanoTime() - t1) / 1e9
      println(f"""{"metric":"bitext_assign_sweep","sf_dir":"$dir","nlist":$nlist,"flat_probe_sec":$flatSec%.2f,"two_level_probe_sec":$twoSec%.2f,"flat_rows":$flatN,"two_level_rows":$twoN}""")
      graft.CacheRegistry.drain()
    }
    spark.stop()
  }

  private def recallProbe(t: graft.sources.Tables, dir: String): Unit = {
    val langs = t.documents.groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val dense = langs.getOrElse("en", 0L) * langs.getOrElse("de", 0L)
    val ivf = graft.operators.Similarity.bitextMineIvf(t)
      .select("src_id", "tgt_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = graft.operators.Similarity.bitextMineIvfCandidates(t)
    val dn = graft.operators.Similarity.bitextMine(t)
      .select("src_id", "tgt_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = if (dn.isEmpty) 1.0 else ivf.intersect(dn).size.toDouble / dn.size
    println(f"""{"metric":"bitext_probe","sf_dir":"$dir","dense_pairs":$dense,"ivf_candidates":$cand,"ivf_mined":${ivf.size},"dense_mined":${dn.size},"recall_vs_dense":$recall%.3f}""")
  }
}
