package graft.tools

import graft.GraftSession
import graft.sources.Tables
import graft.functions.TextFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage-level timing probe for setJoinPrefix (r18 optimization round):
  * times each pipeline stage against the noop sink so the expensive
  * stage is identified by measurement, not guess (guide §1.1/§1.4). */
object SetJoinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("setjoin-probe")
    val t = Tables(spark, sfDir)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val sets = graft.operators.Dedup.spread(
        t.documents.select(col("doc_id"), col("text")))
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("l"))
      .filter(size(col("l")) >= 2)
      .select(col("doc_id"), expr(
        "array_distinct(transform(sequence(1, size(l) - 1), " +
          "i -> concat(element_at(l, i), ' ', element_at(l, i + 1))))").as("arr"))
      .withColumn("s", size(col("arr")).cast("long"))
    // warm
    noop(sets)
    val setsP = sets.persist()
    time("sets-materialize") { noop(setsP) }
    val toks = setsP.select(col("doc_id"), col("s"), explode(col("arr")).as("w"))
    time("toks+dfreq") { noop(toks.groupBy(col("w")).agg(count(lit(1)).as("df"))) }
    val dfreq = toks.groupBy(col("w")).agg(count(lit(1)).as("df")).persist()
    noop(dfreq)
    val pos = toks.join(dfreq, Seq("w"))
      .withColumn("p", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("w"))))
    val pref = pos.filter(col("p") <= col("s") - expr("(9 * s + 9) DIV 10") + 1)
    time("pos+pref") { noop(pref) }
    val prefP = pref.select(col("w"), col("doc_id"), col("s"), col("p")).persist()
    noop(prefP)
    println("pref rows: " + prefP.count())
    val cand = prefP.select(col("w"), col("doc_id").as("doc_a"),
        col("s").as("sa"), col("p").as("pa"))
      .join(prefP.select(col("w"), col("doc_id").as("doc_b"),
        col("s").as("sb"), col("p").as("pb")), Seq("w"))
      .filter(col("doc_a") < col("doc_b") &&
        col("sb") * 10 >= col("sa") * 9 && col("sa") * 10 >= col("sb") * 9 &&
        least(col("sa") - col("pa"), col("sb") - col("pb")) + 1 >=
          expr("(9 * (sa + sb) + 18) DIV 19"))
      .select(col("doc_a"), col("doc_b")).distinct()
    time("cand-join+distinct") { noop(cand) }
    val candP = cand.persist()
    println("cand rows: " + candP.count())
    val verif = candP
      .join(setsP.select(col("doc_id").as("doc_a"), col("arr").as("la")),
        Seq("doc_a"))
      .join(setsP.select(col("doc_id").as("doc_b"), col("arr").as("lb")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("la"), col("lb"))).cast("long").as("inter"),
        size(col("la")).cast("long").as("sa"),
        size(col("lb")).cast("long").as("sb"))
      .filter(col("inter") * 10 >= (col("sa") + col("sb") - col("inter")) * 9)
    time("verify") { noop(verif) }
    time("verify2") { noop(verif) }
    spark.stop()
  }
}
