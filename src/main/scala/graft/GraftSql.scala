package graft

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL surface of the engine: the test tables as temp views plus
  * graft's custom functions in the session registry, so every
  * capability is reachable from `spark.sql(...)` as well as the
  * DataFrame API.
  */
object GraftSql {

  def registerViews(spark: SparkSession, dir: String): Unit =
    Tables(spark, dir).all.foreach { case (name, df) =>
      df.createOrReplaceTempView(name)
    }

  def register(spark: SparkSession, dir: String): Unit = {
    registerViews(spark, dir)
    functions.HashFunctions.registerAll(spark)
    functions.GeoFunctions.registerAll(spark)
  }

  def query(spark: SparkSession, dir: String, sql: String): DataFrame = {
    register(spark, dir)
    spark.sql(sql)
  }
}
