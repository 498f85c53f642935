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
    spark.stop()
  }
}
