package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the stored graph-ANN index: the serving claim is
  * that SEARCH cost is the probe budget — ≤ seeds + hops·beam·degree
  * scored rows per query — independent of corpus size, because the
  * stored graph is navigated through bucketed joins, never scanned.
  * Cells: build the index over the sf0.1 corpus and over a ×10
  * corpus (ScaleUp at /tmp/sf1 when present, else skipped), then time
  * the SAME 10-query search against both. Also reports build wall
  * (expected ~linear: NN-descent shuffles O(n·degree²) rows/round)
  * and insert wall for a fixed 50-vector batch (expected flat:
  * O(batch·budget)).
  *
  * Usage: GraphAnnProbe [sfDir [sf10Dir]]
  */
object GraphAnnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val sf10 = if (args.length > 1) args(1) else "/tmp/sf1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.GraftSession.tune(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.GraphAnnIndex

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    def cell(dir: String, prefix: String): Unit = {
      val emb = graft.sources.Tables(spark, dir).embeddings
      val corpus = emb.filter(col("vec_id") >= 100)
      val n = corpus.count()
      val (_, tBuild) = timed {
        GraphAnnIndex.writeIndex(corpus, prefix)
        graft.CacheRegistry.drain()
      }
      // identical query set at every scale: the sf0.1 ids exist in
      // both corpora (ScaleUp copies are id-offset)
      val queries = emb.filter(col("vec_id") < 10)
        .select((col("vec_id") + 10000000L).as("vec_id"), col("embedding"))
      // warm (footer caches, codegen), then the timed probe
      GraphAnnIndex.search(spark, queries, prefix).count()
      graft.CacheRegistry.drain()
      val (got, tSearch) = timed {
        GraphAnnIndex.search(spark, queries, prefix).count()
      }
      graft.CacheRegistry.drain()
      val batch = emb.filter(col("vec_id") < 50)
        .select((col("vec_id") + 20000000L).as("vec_id"), col("embedding"))
      val (_, tInsert) = timed {
        GraphAnnIndex.insert(spark, batch, prefix)
        graft.CacheRegistry.drain()
      }
      // PQ sidecar (r17): compressed-traversal search at the same
      // probe budget — expected flat across corpus sizes like the
      // uncompressed search, with smaller bytes per scored candidate
      val (_, tPqBuild) = timed {
        GraphAnnIndex.writePq(spark, prefix)
        graft.CacheRegistry.drain()
      }
      GraphAnnIndex.searchPq(spark, queries, prefix).count()
      graft.CacheRegistry.drain()
      val (gotPq, tPq) = timed {
        GraphAnnIndex.searchPq(spark, queries, prefix).count()
      }
      graft.CacheRegistry.drain()
      println(f"GRAPHPROBE n=$n%d build=$tBuild%.2fs " +
        f"search10=$tSearch%.2fs rows=$got%d insert50=$tInsert%.2fs " +
        f"pqbuild=$tPqBuild%.2fs searchpq10=$tPq%.2fs rowspq=$gotPq%d")
    }

    cell(sfDir, "gprobe1")
    if (new java.io.File(s"$sf10/embeddings.parquet").exists())
      cell(sf10, "gprobe10")
    else println(s"GRAPHPROBE ${sf10} missing - x10 cell skipped")
    spark.stop()
  }
}
