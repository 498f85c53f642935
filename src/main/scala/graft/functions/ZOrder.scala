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

  /** Hilbert curve position of 2-D bucket coordinates (the layout
    * clustering Delta OPTIMIZE ships next to z-order): unlike Morton
    * interleave, consecutive Hilbert positions are always grid
    * NEIGHBORS (no quadrant jumps), so range scans over either
    * dimension touch fewer, more contiguous curve runs — tighter file
    * min/max ranges for the same data.
    *
    * Classic xy2d bit-level loop (Wikipedia/Hamilton), one round per
    * bit from the top: extract quadrant bits (rx, ry), accumulate
    * s²·((3·rx) XOR ry), then reflect+swap the frame. Each round is
    * materialized as ONE layered projection (`withColumns`) instead
    * of a folded Column tree — the folded form grows ~5× per round
    * (x and y each reference both predecessors several times) and
    * would hand Catalyst a 5^bits-node expression; the layered form
    * stays linear and whole-stage codegen fuses the rounds into
    * straight-line Java with local-variable reuse. Pure builtin bit
    * arithmetic — no UDF, no custom expression needed.
    *
    * Inputs must already be buckets in [0, 2^bits) (see
    * [[bucketize]]); 2·bits ≤ 62 keeps the position in a long. */
  def withHilbert(df: DataFrame, xName: String, yName: String,
                  bits: Int = 16, out: String = "_h"): DataFrame = {
    require(bits >= 1 && 2 * bits <= 62, s"$bits bits per dim exceeds a long")
    val n = 1L << bits
    var cur = df
      .withColumn("_hx", col(xName).cast("long"))
      .withColumn("_hy", col(yName).cast("long"))
      .withColumn(out, lit(0L))
    for (k <- (bits - 1) to 0 by -1) {
      val s = 1L << k
      cur = cur.withColumns(Map(
        "_rx" -> when(col("_hx").bitwiseAND(lit(s)) =!= 0L, lit(1L)).otherwise(lit(0L)),
        "_ry" -> when(col("_hy").bitwiseAND(lit(s)) =!= 0L, lit(1L)).otherwise(lit(0L))))
      cur = cur.withColumns(Map(
        out -> (col(out) + lit(s * s) * (col("_rx") * lit(3L)).bitwiseXOR(col("_ry"))),
        // reflect (within the full n-grid) then swap — only when ry = 0
        "_hx" -> when(col("_ry") === 1L, col("_hx"))
          .otherwise(when(col("_rx") === 1L, lit(n - 1) - col("_hy"))
            .otherwise(col("_hy"))),
        "_hy" -> when(col("_ry") === 1L, col("_hy"))
          .otherwise(when(col("_rx") === 1L, lit(n - 1) - col("_hx"))
            .otherwise(col("_hx")))))
    }
    cur.drop("_hx", "_hy", "_rx", "_ry")
  }

  /** DuckDB replay of [[withHilbert]]'s rounds: chained CTEs
    * `h1..h{bits}` over a source CTE `h0(..., x, y, d)` with d = 0,
    * carrying `keep` columns through. The last CTE is `h{bits}`. */
  def hilbertOracleCtes(bits: Int, keep: Seq[String]): String = {
    val n = 1L << bits
    val ks = keep.mkString(", ")
    (0 until bits).map { idx =>
      val k = bits - 1 - idx
      val s = 1L << k
      s"""h${idx + 1} AS (SELECT $ks,
         |  CASE WHEN ((y // $s) % 2) = 1 THEN x
         |       WHEN ((x // $s) % 2) = 1 THEN ${n - 1} - y ELSE y END AS x,
         |  CASE WHEN ((y // $s) % 2) = 1 THEN y
         |       WHEN ((x // $s) % 2) = 1 THEN ${n - 1} - x ELSE x END AS y,
         |  d + ${s * s} * xor(3 * ((x // $s) % 2), (y // $s) % 2) AS d
         |FROM h$idx)""".stripMargin
    }.mkString(",\n")
  }

  /** DuckDB replay of [[interleave]] for two columns: bit i of x at
    * position 2i, bit i of y at 2i+1 — matching interleave's
    * (i·n + j) layout for cols = Seq(x, y). */
  def mortonOracleExpr(x: String, y: String, bits: Int): String =
    (0 until bits).flatMap(i => Seq(
      s"((($x >> $i) & 1) << ${2 * i})",
      s"((($y >> $i) & 1) << ${2 * i + 1})")).mkString(" | ")
}
