package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Planar geometry over `array<struct<x:double,y:double>>` rings.
  *
  * Re-expresses the reference's sf-based geometry step
  * (crowdsorsa-etl-2023.R:36-40: `st_make_valid` → cast MULTIPOLYGON →
  * `st_area` → `ceiling`) as pure Catalyst higher-order functions, so the
  * whole computation stays inside whole-stage codegen — no UDF, no
  * serialization boundary, scales linearly with rows and shuffles nothing.
  */
object GeoFunctions {

  private def px(p: Column): Column = p.getField("x")
  private def py(p: Column): Column = p.getField("y")

  /** Close an open ring (append first vertex if last != first).
    * The validity-repair analog of st_make_valid for the simple
    * "unclosed ring" defect class. */
  def closeRing(ring: Column): Column = {
    val first = element_at(ring, 1)
    val last  = element_at(ring, -1)
    when(px(first) === px(last) && py(first) === py(last), ring)
      .otherwise(concat(ring, array(first)))
  }

  /** Twice the signed shoelace sum of a closed ring (positive = CCW). */
  def signedArea2(ring: Column): Column = {
    val idx = sequence(lit(1), size(ring) - 1)
    val cross = transform(idx, i =>
      px(element_at(ring, i)) * py(element_at(ring, i + 1)) -
        px(element_at(ring, i + 1)) * py(element_at(ring, i)))
    aggregate(cross, lit(0.0), (acc, v) => acc + v)
  }

  /** Unsigned planar polygon area of a closed ring (shoelace formula).
    * Mirrors `sf::st_area` (crowdsorsa-etl-2023.R:40) for planar CRS. */
  def polygonArea(ring: Column): Column = abs(signedArea2(ring)) / 2.0

  /** Area of a polygon whose ring may be unclosed: make-valid then area. */
  def polygonAreaValid(ring: Column): Column = polygonArea(closeRing(ring))

  /** Reference rounds areas up to whole square meters
    * (crowdsorsa-etl-2023.R:40 `ceiling(as.numeric(st_area(...)))`). */
  def areaCeilM2(ring: Column): Column =
    ceil(polygonAreaValid(ring)).cast("long")

  /** Multipolygon area: `array<array<struct<x,y>>>` — outer area = sum
    * of component polygon areas (the reference casts everything to
    * MULTIPOLYGON before st_area; 2023.R:36-40). */
  def multiPolygonArea(rings: Column): Column =
    aggregate(transform(rings, r => polygonAreaValid(r)), lit(0.0), (a, v) => a + v)

  /** Axis-aligned bounding box of a ring as struct(xmin,ymin,xmax,ymax). */
  def bbox(ring: Column): Column = struct(
    array_min(transform(ring, px(_))).as("xmin"),
    array_min(transform(ring, py(_))).as("ymin"),
    array_max(transform(ring, px(_))).as("xmax"),
    array_max(transform(ring, py(_))).as("ymax"))
}
