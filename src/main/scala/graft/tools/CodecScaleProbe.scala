package graft.tools

import org.apache.spark.sql.SparkSession

/** 100×-point scale cell for a codec path (VERDICT r14 item 7): times
  * a registered per-doc codec query at a (scaled) sf dir and — the
  * round-14 lesson — asserts a SCALE-SENSITIVE quantity (the
  * decoded-doc row count) rather than wall time alone, so a silently
  * degraded run (missing table, misaligned ids) cannot masquerade as
  * a fast cell. Usage: CodecScaleProbe <sfDir> [queryKey] [expectRows]
  */
object CodecScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val key = if (args.length > 1) args(1) else "q_audio_features"
    val expect = if (args.length > 2) Some(args(2).toLong) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.tune(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(key)
    fn(spark, dir).count() // warm-up: codegen + footer caches
    graft.CacheRegistry.drain()
    spark.catalog.clearCache()
    val t0 = System.nanoTime()
    val rows = fn(spark, dir).count()
    val sec = (System.nanoTime() - t0) / 1e9
    expect.foreach { e =>
      require(rows == e,
        s"scale-cell degradation: $key returned $rows rows, expected $e")
    }
    println(f"""{"metric":"codec_scale","query":"$key","sf_dir":"$dir","rows":$rows,"sec":$sec%.2f}""")
    spark.stop()
  }
}
