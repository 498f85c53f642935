package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan of selected queries
  * so shuffle/broadcast/pushdown regressions are visible in review.
  * `runMain graft.Explain [sfDir] [query ...]` */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq else Seq(
      "q1_agg", "q3_shipping", "q5_local", "q_asof_join", "q_dedup_minhash",
      "q_knn_cosine", "q_lookup_enrich", "q_doc_assembly")
    val spark = GraftSession.tune(
      SparkSession.builder().master("local[4]"), 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
