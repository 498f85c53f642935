package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HashFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def simOf(s: String): Long =
    Seq(s).toDF("t").select(HashFunctions.simhash64(split(col("t"), " "))).head.getLong(0)

  test("simhash64: similar token sets land within small hamming distance") {
    val a = simOf("the quick brown fox jumps over the lazy dog again and again today")
    val b = simOf("the quick brown fox jumps over the lazy dog again and again tonight")
    val c = simOf("completely unrelated words about spark catalyst expressions and joins")
    def hamming(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(hamming(a, b) < hamming(a, c), s"${hamming(a, b)} vs ${hamming(a, c)}")
    assert(hamming(a, a) == 0)
  }

  test("simhash64 is deterministic and non-trivial") {
    assert(simOf("alpha beta gamma") == simOf("alpha beta gamma"))
    assert(simOf("alpha beta gamma") != simOf("delta epsilon zeta"))
  }

  test("rollingHashes matches direct per-window polynomial hash") {
    val s = "abcdefgh"
    val k = 3
    val got = Seq(s).toDF("t")
      .select(HashFunctions.rollingHashes(col("t"), k)).head.getSeq[Long](0)
    val B = 1000003L
    val expect = s.getBytes("UTF-8").sliding(k).map(
      _.foldLeft(0L)((h, b) => h * B + (b & 0xffL))).toSeq
    assert(got == expect)
    // shorter than k -> empty
    val empty = Seq("ab").toDF("t")
      .select(HashFunctions.rollingHashes(col("t"), k)).head.getSeq[Long](0)
    assert(empty.isEmpty)
  }

  test("expressions work via SQL registration and inside codegen plans") {
    HashFunctions.registerAll(spark)
    val n = spark.sql(
      "SELECT graft_simhash64(array('a','b')) AS h").head.getLong(0)
    assert(n == simOf("a b"))
    // exercise through a real scan + filter plan (whole-stage codegen)
    val cnt = tables.documents
      .select(HashFunctions.simhash64(split(col("text"), " ")).as("fp"))
      .filter(col("fp") =!= 0L).count()
    assert(cnt > 0)
  }
}
