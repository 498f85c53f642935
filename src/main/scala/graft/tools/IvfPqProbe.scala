package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Recall probe for the float IVFADC twin's coarse-init choice
  * (VERDICT r12 item 5): for each init (random-partition M-step vs
  * Forgy + one Lloyd round) measure, against global exact-L2 truth,
  *   - the PROBE CEILING: exact L2 restricted to the nprobe admitted
  *     buckets (what any scoring could achieve under that codebook);
  *   - the ADC recall: what the shipped ADC scoring actually achieves.
  * The ceiling isolates the coarse layer's contribution; ceiling→ADC
  * is quantization error, which the init does not touch.
  *
  * Usage: IvfPqProbe <sfDir> [k]
  */
object IvfPqProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val k = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.GraftSession.tune(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = graft.sources.Tables(spark, dir)

    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select(col("query_id"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // exact L2 truth over the same double values the fp kernel uses
    val v = t.embeddings
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("vec_id"), col("dim").cast("long").as("dim"),
        col("x").cast("double").as("m"))
    val q = v.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("dim"), col("m").as("qm"))
    val exact = v.withColumnRenamed("vec_id", "neighbor_id")
      .join(q, Seq("dim")).filter(col("neighbor_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum((col("qm") - col("m")) * (col("qm") - col("m"))).as("d2"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("d2"), col("neighbor_id"))
    val truth = pairs(exact.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k))

    def recall(s: Set[(Long, Long)]): Double =
      truth.intersect(s).size.toDouble / truth.size

    val cells = Seq("partition", "forgy").map { init =>
      val ceil = recall(pairs(
        graft.operators.Similarity.ivfPqCeiling(t, k, coarseInit = init)))
      graft.CacheRegistry.drain()
      val adc = recall(pairs(
        graft.operators.Similarity.ivfPqKnn(t, k, coarseInit = init)))
      graft.CacheRegistry.drain()
      s"""{"init":"$init","probe_ceiling_recall":$ceil,"adc_recall":$adc}"""
    }
    println(s"""{"k":$k,"truth_pairs":${truth.size},"cells":[${cells.mkString(",")}]}""")
    spark.stop()
  }
}
