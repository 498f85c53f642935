package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bench tooling: synthesize an sf×N corpus from an existing sf dir so
  * the scaling behavior of the heavy operators can be measured past the
  * largest driver-generated scale factor (TESTDATA tops out at sf0.1).
  *
  * The scaled corpus is N structurally-independent copies — NOT naive
  * row duplication, which would manufacture cross-copy near-duplicates
  * and quadratic pair growth no real corpus has:
  *   - documents: every token gets a per-copy suffix, so shingle/token
  *     sets across copies are disjoint (dedup pairs scale linearly, as
  *     they would with genuinely new data);
  *   - embeddings: dimensions rotate by a per-copy stride — random
  *     vectors become near-orthogonal across copies while within-copy
  *     cosine structure is preserved exactly;
  *   - lineitem: order/part/supp keys get disjoint per-copy offsets
  *     (co-purchase graph = N disjoint copies, constant diameter).
  * doc_id offsets are multiples of 100 so the `% 100` bench-membership
  * fraction in decontaminate is preserved.
  *
  * Usage: ScaleUp <srcSfDir> <outDir> <factor>
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val (src, out, n) = (args(0), args(1), args(2).toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.GraftSession.tune(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def copies(df: DataFrame, f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until n).map(k => f(df, k)).reduce(_ unionAll _)

    val docs = spark.read.parquet(s"$src/documents.parquet")
    copies(docs, (d, k) =>
      if (k == 0) d
      else d.select(
        (col("doc_id") + lit(k * 100000L)).as("doc_id"),
        concat_ws(" ", transform(split(col("text"), " "),
          x => concat(x, lit(s"_$k")))).as("text"),
        col("lang"), col("source"), col("n_chars"))
        .withColumn("n_chars", length(col("text")))
    ).repartition(32).write.mode(SaveMode.Overwrite).parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    // vec_id offset MATCHES the documents offset (k·100000): operators
    // that join documents⋈embeddings on doc_id = vec_id (bitext mining,
    // doc-level semdedup) must see copy-k docs paired with copy-k
    // vectors — a mismatched offset silently shrinks a "10×" run of
    // those operators back to the 1× slice (caught in round 14)
    copies(emb, (e, k) =>
      if (k == 0) e
      else {
        val shift = (k * 7) % 64
        e.select(
          (col("vec_id") + lit(k * 100000L)).as("vec_id"),
          transform(sequence(lit(0), lit(63)),
            i => element_at(col("embedding"), (i + lit(shift)) % 64 + 1)).as("embedding"),
          col("label"))
      }
    ).repartition(32).write.mode(SaveMode.Overwrite).parquet(s"$out/embeddings.parquet")

    val li = spark.read.parquet(s"$src/lineitem.parquet")
    copies(li, (l, k) =>
      if (k == 0) l
      else l
        .withColumn("l_orderkey", col("l_orderkey") + lit(k * 1000000L))
        .withColumn("l_partkey", col("l_partkey") + lit(k * 100000L))
        .withColumn("l_suppkey", col("l_suppkey") + lit(k * 100000L))
    ).repartition(32).write.mode(SaveMode.Overwrite).parquet(s"$out/lineitem.parquet")

    // events: disjoint per-copy user/event-id populations over the SAME
    // time range — N independent tenant loads in one window, so
    // sessions/funnels/windows grow linearly with no cross-copy state.
    // (ts passes through as read; with nanosAsLong that re-writes a
    // NANOS file as BIGINT nanos, which Tables.events handles.)
    if (new java.io.File(s"$src/events.parquet").exists()) {
      val ev = spark.read.parquet(s"$src/events.parquet")
      copies(ev, (e, k) =>
        if (k == 0) e
        else e
          .withColumn("event_id", col("event_id") + lit(k * 10000000L))
          .withColumn("user_id", col("user_id") + lit(k * 1000000L))
      ).repartition(32).write.mode(SaveMode.Overwrite).parquet(s"$out/events.parquet")
    }

    // remaining tables (TPC-H dims + orders etc.) pass through UNSCALED
    // so every registered query runs against the scaled dir — dims
    // don't grow with corpus factor anyway, and a missing table would
    // silently zero out its queries' scaling cells
    val scaled = Set("documents", "embeddings", "lineitem", "events")
    Option(new java.io.File(src).listFiles()).toSeq.flatten
      .filter(f => f.getName.endsWith(".parquet") &&
        !scaled(f.getName.stripSuffix(".parquet")))
      .foreach { f =>
        spark.read.parquet(f.getPath).write
          .mode(SaveMode.Overwrite).parquet(s"$out/${f.getName}")
      }

    println(s"scaled $src x$n -> $out")
    spark.stop()
  }
}
