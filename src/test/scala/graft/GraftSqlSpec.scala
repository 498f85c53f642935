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

  test("table maintenance statements: OPTIMIZE / VACUUM / DESCRIBE HISTORY / dispatch (r18)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val path = java.nio.file.Files
      .createTempDirectory("graft-sqlstmt").toString + "/t"
    graft.sinks.SnapshotStore.commit(
      spark.range(0, 200).select(col("id"), (col("id") * 2).as("v"))
        .repartition(8),
      path, statsKey = Some("id"))
    graft.sinks.SnapshotStore.commit(
      Seq((500L, 1L)).toDF("id", "v"), path,
      org.apache.spark.sql.SaveMode.Append)
    val before = graft.sinks.SnapshotStore.read(spark, path)
      .inputFiles.length
    // OPTIMIZE compacts (statsKey-tracked coalesce path)
    val v3 = GraftSql.optimize(spark, s"OPTIMIZE '$path'")
    assert(v3 == 3L)
    assert(graft.sinks.SnapshotStore.read(spark, path)
      .inputFiles.length < before)
    assert(graft.sinks.SnapshotStore.read(spark, path).count() == 201)
    // ZORDER variant
    val v4 = GraftSql.optimize(spark,
      s"OPTIMIZE '$path' ZORDER BY (id, v)")
    assert(v4 == 4L)
    assert(graft.sinks.SnapshotStore.read(spark, path).count() == 201)
    // VACUUM RETAIN through the statement; history shrinks to the window
    val dropped = GraftSql.vacuum(spark, s"VACUUM '$path' RETAIN 2 VERSIONS")
    assert(dropped > 0)
    val hist = GraftSql.describeHistory(spark, s"DESCRIBE HISTORY '$path'")
    assert(hist.select("version").as[Long].collect().sorted.toSeq ==
      Seq(3L, 4L))
    // unified dispatch: a mutation returns its version as a frame
    assert(GraftSql.statement(spark, s"DELETE FROM '$path' WHERE id >= 100")
      .as[Long].head() == 5L)
    assert(GraftSql.statement(spark, s"DESCRIBE HISTORY '$path'")
      .count() == 3)
    intercept[IllegalArgumentException] {
      GraftSql.statement(spark, "TRUNCATE 'nope'")
    }
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
