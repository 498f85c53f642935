package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized property checks (seeded, deterministic): the Catalyst
  * implementations against plain Scala reference implementations. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def refShoelace(pts: Seq[(Double, Double)]): Double = {
    val ring = pts :+ pts.head
    math.abs(ring.sliding(2).map { case Seq((x1, y1), (x2, y2)) =>
      x1 * y2 - x2 * y1 }.sum) / 2.0
  }

  test("polygonAreaValid matches a reference shoelace on random polygons") {
    val rnd = new scala.util.Random(11)
    (1 to 20).foreach { _ =>
      val n = 3 + rnd.nextInt(6)
      val pts = Seq.fill(n)((rnd.nextDouble() * 200 - 100, rnd.nextDouble() * 200 - 100))
      val df = Seq(1).toDF("i").select(array(pts.map { case (x, y) =>
        struct(lit(x).as("x"), lit(y).as("y")) }: _*).as("ring"))
      val got = df.select(GeoFunctions.polygonAreaValid(col("ring"))).head.getDouble(0)
      val exp = refShoelace(pts)
      assert(math.abs(got - exp) <= 1e-9 * math.max(1.0, exp), s"pts=$pts got=$got exp=$exp")
    }
  }

  test("rollingHashes equals direct k-gram hashing on random strings") {
    val rnd = new scala.util.Random(13)
    val B = 1000003L
    val k = 5
    (1 to 20).foreach { _ =>
      val s = Seq.fill(rnd.nextInt(40))(('a' + rnd.nextInt(26)).toChar).mkString
      val got = Seq(s).toDF("t")
        .select(HashFunctions.rollingHashes(col("t"), k)).head.getSeq[Long](0)
      val bytes = s.getBytes("UTF-8")
      val expect =
        if (bytes.length < k) Seq.empty[Long]
        else bytes.sliding(k).map(_.foldLeft(0L)((h, b) => h * B + (b & 0xffL))).toSeq
      assert(got == expect, s"input='$s'")
    }
  }

  test("subFirst behaves like Scala's replaceFirst(quoted) on random inputs") {
    val rnd = new scala.util.Random(17)
    (1 to 30).foreach { _ =>
      val s = Seq.fill(12)("abc ".charAt(rnd.nextInt(4))).mkString
      val find = Seq.fill(2)("ab".charAt(rnd.nextInt(2))).mkString
      val got = Seq(s).toDF("t")
        .select(TextFunctions.subFirst(col("t"), find, "XY")).head.getString(0)
      val expect = s.replaceFirst(java.util.regex.Pattern.quote(find), "XY")
      assert(got == expect, s"input='$s' find='$find'")
    }
  }

  test("simhash hamming distance grows with token-set divergence") {
    val base = (1 to 30).map(i => s"tok$i")
    def fp(tokens: Seq[String]): Long =
      Seq(tokens.mkString(" ")).toDF("t")
        .select(HashFunctions.simhash64(split(col("t"), " "))).head.getLong(0)
    val f0 = fp(base)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val near = ham(f0, fp(base.updated(0, "CHANGED")))
    val far = ham(f0, fp((1 to 30).map(i => s"other$i")))
    assert(near < far, s"near=$near far=$far")
  }
}
