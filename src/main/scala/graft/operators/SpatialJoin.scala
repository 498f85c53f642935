package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid-bucketed 2D spatial join — the planar generalization of
  * RangeJoin's 1D interval bucketing, and the scalable form of the
  * reference's point-in-municipality assignment (its R sibling does
  * st_within row-at-a-time).
  *
  * Points land in exactly one grid cell; each rectangle is exploded to
  * every cell it covers (bounded fan-out: ceil(w/g)·ceil(h/g) cells —
  * pick `g` near the typical rectangle size so that's ~1-4). The join
  * is then a plain EQUI-join on the cell key — shuffle by cell, never
  * an O(|points|·|rects|) cross product — with the exact containment
  * predicate as a map-side residual filter. A point inside a rectangle
  * matches in exactly its own cell, so no dedup pass is needed.
  * Skewed cells (a hot downtown cell at 100 TB) are ordinary join
  * skew: AQE splits them like any other hot key.
  */
object SpatialJoin {

  private def cell(c: Column, g: Double): Column = floor(c / g).cast("long")

  /** Count points per containing rectangle. `pts` needs (x, y) +
    * `ptId`; `rects` needs (x0, x1, y0, y1) + `rectId`. */
  def pointsInRects(pts: DataFrame, rects: DataFrame, rectId: String,
                    g: Double = 16.0): DataFrame = {
    val cells = rects
      .withColumn("_cx", explode(sequence(cell(col("x0"), g), cell(col("x1"), g))))
      .withColumn("_cy", explode(sequence(cell(col("y0"), g), cell(col("y1"), g))))
    val p = pts
      .withColumn("_cx", cell(col("x"), g))
      .withColumn("_cy", cell(col("y"), g))
    p.join(cells, Seq("_cx", "_cy"))
      .filter(col("x").between(col("x0"), col("x1")) &&
              col("y").between(col("y0"), col("y1")))
      .groupBy(col(rectId))
      .agg(count(lit(1)).as("n_points"))
      .orderBy(col(rectId))
  }

  /** Oracled instance: synthetic points from events, rectangles from
    * customers — all coordinates exact small integers/doubles so the
    * containment predicate is bit-identical in any engine (the oracle
    * runs the brute-force cross join + BETWEEN). */
  def eventsInZones(t: Tables): DataFrame = {
    val pts = t.events.select(col("event_id"), col("value").as("x"),
      (col("user_id") % 128).cast("double").as("y"))
    val rects = t.customer.select(col("c_custkey"),
        (col("c_custkey") % 97).cast("double").as("x0"),
        (col("c_custkey") % 53).cast("double").as("y0"),
        (col("c_nationkey") % 5).cast("double").as("w"))
      .select(col("c_custkey"), col("x0"), col("y0"),
        (col("x0") + lit(2.0) + col("w")).as("x1"),
        (col("y0") + lit(3.0)).as("y1"))
    // g = 4 ≈ the rectangle size (2–6 wide, 3 tall), per the grid-size
    // guidance above: rects fan out to ~2-6 cells while cells stay
    // small enough that the equi-join's candidate set tracks the true
    // match count, not |points|·(rects per mega-cell). The previous
    // g = 16 packed ~500 rects into each of ~28 cells → ~50M candidate
    // pairs for ~1.5k true matches; g = 4 cuts candidates ~3×.
    pointsInRects(pts, rects, "c_custkey", g = 4.0)
  }
}
