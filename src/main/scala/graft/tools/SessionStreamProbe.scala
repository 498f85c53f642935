package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** VERDICT r13 item 6: the streaming session_window path has
  * correctness-only specs — this probe measures its FINALIZATION
  * latency at bench scale so BENCH_SCALING gets an event-stream cell
  * for the stateful session operator, 1× vs 10×.
  *
  * The events parquet dir is replayed through the file STREAM source
  * (Trigger.AvailableNow, maxFilesPerTrigger-free: one pass in
  * micro-batches sized by the source), through
  * [[graft.streaming.EventStreams.sessionWindowStream]] — watermark,
  * session_window state store, append-mode finalization — into a
  * memory sink. Reported secs = start → stream termination, i.e. the
  * full ingest-to-finalized-sessions latency for the corpus.
  *
  * Usage: SessionStreamProbe <sfDir> [reps]
  */
object SessionStreamProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.tune(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the file stream source needs a DIRECTORY; driver-generated SFs
    // ship events.parquet as a single file — stage a symlink dir
    val src = new java.io.File(s"$dir/events.parquet")
    val streamDir =
      if (src.isDirectory) src.getPath
      else {
        val d = java.nio.file.Files.createTempDirectory("sessprobe-src")
        java.nio.file.Files.createSymbolicLink(
          d.resolve("events.parquet"), src.toPath.toAbsolutePath)
        d.toString
      }
    // explicit schema; normalize ts the way Tables.events does
    // (nanos-as-long vs native micros)
    val rawSchema = spark.read.parquet(streamDir).schema
    def normalized(df: org.apache.spark.sql.DataFrame) =
      rawSchema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
        case _ => df.withColumn("ts", col("ts").cast("timestamp"))
      }

    var best = Double.MaxValue
    var rows = -1L
    for (r <- 1 to reps) {
      val name = s"sessprobe_$r"
      val stream = normalized(
        spark.readStream.schema(rawSchema).parquet(streamDir))
      val sessions = graft.streaming.EventStreams.sessionWindowStream(stream)
      val t0 = System.nanoTime()
      val q = sessions.writeStream.format("memory").queryName(name)
        .outputMode("append")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("sessprobe-ck").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val secs = (System.nanoTime() - t0) / 1e9
      rows = spark.table(name).count()
      println(f"""{"rep":$r,"secs":$secs%.2f,"finalized_sessions":$rows}""")
      spark.sql(s"DROP VIEW IF EXISTS $name")
      if (secs < best) best = secs
    }
    println(f"""{"metric":"session_stream","min_secs":$best%.2f,"finalized_sessions":$rows,"sf_dir":"$dir"}""")
    spark.stop()
  }
}
