package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CoGroupSpec extends SparkSpec {

  test("typed cogroup reconciliation matches the declarative join+agg twin") {
    val typed = CoGroup.reconcile(tables).toDF()
      .select(col("key"), col("n_orders"), col("n_events"), col("status"))
    val sql = CoGroup.reconcileSql(tables)
      .select(col("key"), col("n_orders"), col("n_events"), col("status"))
    assert(typed.exceptAll(sql).isEmpty && sql.exceptAll(typed).isEmpty)
    // sanity: statuses are exercised by the test data
    val statuses = typed.select("status").distinct()
      .collect().map(_.getString(0)).toSet
    assert(statuses.contains("engaged") || statuses.contains("dormant"))
  }
}
