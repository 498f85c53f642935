package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional layout
  * clustering — the write-side optimization that makes min/max
  * data-skipping work on MORE than one filter column: sorting by
  * (x, y) gives perfect pruning on x and none on y, while z-order
  * gives ~sqrt pruning on both. Pure bit arithmetic on bounded
  * integer buckets, all codegen'd builtins (shifts/masks/or) — no UDF.
  */
object ZOrder {

  /** Interleave the low `bits` bits of the given non-negative long
    * columns: result bit (i*n + j) = bit i of column j. With the
    * default 16 bits and 2 columns the z-value fits 32 bits. */
  def interleave(cols: Seq[Column], bits: Int = 16): Column = {
    val n = cols.length
    require(n >= 1 && n * bits <= 63, s"$n cols × $bits bits exceeds a long")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      cols.zipWithIndex.foldLeft(acc) { case (a, (c, j)) =>
        a.bitwiseOR(shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + j))
      }
    }
  }

  /** Map an arbitrary numeric column onto [0, 2^bits) buckets using its
    * GLOBAL min/max (one tiny aggregate, broadcast back). Rank-free —
    * no global sort; skew in the value distribution translates to
    * skew in bucket occupancy, which only degrades (never breaks)
    * skipping. */
  def bucketize(c: Column, mn: Column, mx: Column, bits: Int = 16): Column = {
    val span = mx - mn
    val buckets = lit((1L << bits) - 1)
    when(span === 0, lit(0L))
      .otherwise(floor((c - mn).cast("double") / span.cast("double") * buckets)
        .cast("long"))
  }

  /** Attach a `_z` column: global min/max per dimension (single
    * skinny aggregate joined back as a 1-row broadcast), bucketize,
    * interleave. The caller range-partitions/sorts by `_z` before
    * writing — see TableWriter. */
  def withZ(df: DataFrame, dims: Seq[String], bits: Int = 16): DataFrame = {
    val stats = df.agg(
      lit(1).as("_one"),
      dims.flatMap(d => Seq(min(col(d)).as(s"_mn_$d"), max(col(d)).as(s"_mx_$d"))): _*)
    val z = interleave(
      dims.map(d => bucketize(col(d), col(s"_mn_$d"), col(s"_mx_$d"), bits)), bits)
    df.crossJoin(broadcast(stats))
      .withColumn("_z", z)
      .drop("_one" +: dims.flatMap(d => Seq(s"_mn_$d", s"_mx_$d")): _*)
  }
}
