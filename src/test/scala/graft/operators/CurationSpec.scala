package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

class CurationSpec extends SparkSpec {

  test("epochShuffle: each epoch is a full permutation, orders differ across epochs") {
    val r = Curation.epochShuffle(tables, epochs = 2)
      .select("epoch", "doc_id", "pos")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val byEpoch = r.groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    val n = byEpoch(1L).size
    assert(byEpoch(1L).toSet == byEpoch(2L).toSet && n > 0) // same docs
    assert(byEpoch.values.forall(_.distinct.size == n))     // each pos once
    assert(byEpoch(1L) != byEpoch(2L))                      // different order
    // rerun: byte-identical manifest (no RNG state anywhere)
    val again = Curation.epochShuffle(tables, epochs = 2)
      .select("epoch", "doc_id", "pos")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(again.toSeq == r.toSeq)
  }
  import spark.implicits._

  test("globalRunningSum equals the single-partition running-sum window") {
    val df = tables.orders.select(col("o_orderkey"),
      (col("o_orderkey") % 97).cast("long").as("v"))
    val scalable = Curation.globalRunningSum(df, "v", col("o_orderkey"))
      .select(col("o_orderkey"), col("_cum"))
    val naive = df.withColumn("_cum",
        sum(col("v")).over(Window.orderBy(col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("o_orderkey"), col("_cum"))
    assert(scalable.exceptAll(naive).isEmpty && naive.exceptAll(scalable).isEmpty)
  }

  test("globalRowNumber equals the single-partition global window") {
    val df = tables.orders.select(col("o_orderkey"), col("o_totalprice"))
    val scalable = Curation.globalRowNumber(df, col("o_totalprice").desc, col("o_orderkey"))
      .select(col("o_orderkey"), col("_rn"))
    val naive = df.withColumn("_rn",
        row_number().over(Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))).cast("long"))
      .select(col("o_orderkey"), col("_rn"))
    assert(scalable.exceptAll(naive).isEmpty && naive.exceptAll(scalable).isEmpty)
    // and it actually ran with >1 partition upstream of the local window
    assert(df.sparkSession.sparkContext.defaultParallelism > 1)
  }

  test("shard balance: round-robin by size keeps shards within one doc's tokens") {
    val r = Curation.shardBalance(tables, shards = 4)
      .select("shard_tokens").as[Long].collect()
    assert(r.length == 4)
    val spreadRatio = (r.max - r.min).toDouble / r.max
    assert(spreadRatio < 0.1, s"shard token spread too wide: ${r.toSeq}")
  }

  test("hash sampling is deterministic and ~25%") {
    val n = tables.documents.count()
    val s1 = Curation.sampleHash(tables).as[Long].collect().toSeq
    val s2 = Curation.sampleHash(tables).as[Long].collect().toSeq
    assert(s1 == s2)
    assert(s1.length > n / 8 && s1.length < n / 2, s"${s1.length} of $n")
  }
}
