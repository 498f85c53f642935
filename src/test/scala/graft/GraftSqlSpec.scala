package graft

import org.apache.spark.sql.functions._

class GraftSqlSpec extends SparkSpec {

  test("every capability is reachable through the SQL surface") {
    val r = GraftSql.query(spark, sfDir,
      """SELECT n_name, COUNT(*) AS n
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n DESC, n_name LIMIT 3""".stripMargin)
    assert(r.count() == 3)
  }

  test("custom expressions registered for SQL (simhash, rolling hashes)") {
    GraftSql.register(spark, sfDir)
    val r = spark.sql(
      """SELECT doc_id, graft_simhash64(split(text, ' ')) AS fp,
        |       size(graft_rolling_hashes(text)) AS n_kgrams
        |FROM documents LIMIT 5""".stripMargin).collect()
    assert(r.length == 5 && r.forall(row => row.getLong(1) != 0L && row.getInt(2) > 0))
  }
}
