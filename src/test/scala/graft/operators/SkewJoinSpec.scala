package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    // 90% of rows share key 1 — the pathological heavy hitter
    val big = spark.range(10000)
      .select(when(col("id") % 10 === 0, col("id") % 100).otherwise(1L).as("k"),
        col("id").as("payload"))
    val small = Seq((1L, "one"), (2L, "two"), (30L, "thirty")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("k", "payload", "name")
    val salted = SkewJoin.saltedJoin(big, small, "k", salts = 8)
      .select("k", "payload", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }
}
