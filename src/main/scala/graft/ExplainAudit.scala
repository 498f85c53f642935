package graft
import org.apache.spark.sql.SparkSession

/** Plan-audit tool: print the formatted physical plan for the named
  * queries (all queries if none named) at the given sf dir — the
  * check behind SURVEY §5's shuffle-budget table. Look for: filters in
  * `PushedFilters`, pruned `ReadSchema`, `BroadcastHashJoin` on the
  * dimension/vocabulary sides, and wide `WholeStageCodegen` spans.
  *
  * Usage: runMain graft.ExplainAudit <sfDir> [q_a,q_b,...]
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val only: Option[Set[String]] =
      if (args.length > 1) Some(args(1).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.tune(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        println(s"\n========== $name ==========")
        try println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        catch { case e: Throwable => println(s"[explain failed] $e") }
        finally spark.catalog.clearCache()
      }
    spark.stop()
  }
}
