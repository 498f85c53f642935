package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Seeded property checks for the Morton interleave kernel against a
  * plain Scala reference model. */
class ZOrderPropertySpec extends SparkSpec {
  import spark.implicits._

  private def zOf(pairs: Seq[(Long, Long)], bits: Int): Seq[Long] =
    pairs.toDF("x", "y")
      .select(ZOrder.interleave(Seq(col("x"), col("y")), bits).as("z"))
      .as[Long].collect().toSeq

  test("interleave is a bijection on the bit-bounded domain") {
    val pts = for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)
    val zs = zOf(pts.toSeq, bits = 5)
    assert(zs.distinct.size == pts.size)            // injective
    assert(zs.min == 0L && zs.max == 32L * 32 - 1)  // onto [0, 2^10)
  }

  test("interleave decodes back to its inputs (reference de-interleave)") {
    val rnd = new scala.util.Random(42)
    val pts = Seq.fill(200)((rnd.nextLong(65536L), rnd.nextLong(65536L)))
    val zs = zOf(pts, bits = 16)
    pts.zip(zs).foreach { case ((x, y), z) =>
      var (dx, dy) = (0L, 0L)
      for (i <- 0 until 16) {
        dx |= ((z >> (2 * i)) & 1L) << i
        dy |= ((z >> (2 * i + 1)) & 1L) << i
      }
      assert(dx == x && dy == y, s"z=$z decoded ($dx,$dy) != ($x,$y)")
    }
  }

  test("points in the same aligned quadrant share the z prefix") {
    // the locality property file-skipping relies on: 2^k-aligned
    // quadrants map to contiguous z ranges (shared prefix above 2k bits)
    val rnd = new scala.util.Random(7)
    (1 to 100).foreach { _ =>
      val (x, y) = (rnd.nextLong(65536L), rnd.nextLong(65536L))
      val k = 8 // 256-aligned quadrant
      val (x2, y2) = ((x & ~255L) | rnd.nextLong(256L), (y & ~255L) | rnd.nextLong(256L))
      val Seq(a, b) = zOf(Seq((x, y), (x2, y2)), 16)
      assert((a >> (2 * k)) == (b >> (2 * k)), s"($x,$y) vs ($x2,$y2)")
    }
  }

  test("quantizeInt8 invariants: |q| <= 127, max-abs dim saturates, scale positive") {
    val r = graft.operators.Similarity.quantizeInt8(tables).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (scale, n, nSat) = (row.getDouble(2), row.getLong(1), row.getLong(4))
      assert(scale > 0.0 && n == 64L)
      assert(nSat >= 1L && nSat <= n) // the absmax dim always hits ±127
      // checksum of 64 values each in [-127,127]
      assert(math.abs(row.getLong(3)) <= 127L * n)
    }
  }
}
