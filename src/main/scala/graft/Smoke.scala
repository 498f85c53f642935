package graft

import org.apache.spark.sql.SparkSession

/** Mimics the driver's t1 smoke: a VANILLA session (none of
  * GraftSession's tuning) calling SparkEntry.entry, expecting rows>0.
  * Guards against entry() growing a dependency on session conf. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = SparkEntry.entry(spark).count()
    println(s"""{"smoke_rows":$n}""")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
