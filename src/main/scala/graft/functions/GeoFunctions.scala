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

  /** IUGG mean Earth radius, meters. */
  val EarthRadiusM = 6371008.8

  /** Spherical polygon area in m² of a closed ring with x = longitude,
    * y = latitude in degrees (Chamberlain & Duquette, "Some algorithms
    * for polygons on a sphere", JPL 2007):
    *   A = R²/2 · |Σ_i (λ_{i+1} − λ_i)(sin φ_i + sin φ_{i+1})|
    * The geodesic analog of `sf::st_area` on WGS84 geometry
    * (crowdsorsa-etl-2023.R:40), which the planar shoelace gets wrong
    * in degree space — at 60°N a 1°×1° "square" is half as wide as it
    * is tall. Spherical (not ellipsoidal) radius: within ~0.3% of
    * st_area's ellipsoid for small features, and a public closed-form
    * both the engine and the oracle can evaluate term-for-term.
    * Cross-engine note: sin/radians were verified bit-identical
    * between the JVM and DuckDB's libm over this dataset's coordinate
    * grid; the oracled query still ceils to whole m² so a 1-ulp libm
    * divergence on future data cannot flip the compare. */
  def sphericalArea(ring: Column): Column = {
    val r = closeRing(ring)
    val idx = sequence(lit(1), size(r) - 1)
    val terms = transform(idx, i =>
      (radians(px(element_at(r, i + 1))) - radians(px(element_at(r, i)))) *
        (sin(radians(py(element_at(r, i)))) + sin(radians(py(element_at(r, i + 1))))))
    abs(aggregate(terms, lit(0.0), (a, v) => a + v)) *
      lit(EarthRadiusM * EarthRadiusM / 2.0)
  }

  /** Spherical area rounded up to whole m², mirroring the reference's
    * `ceiling(as.numeric(st_area(...)))` (2023.R:40). */
  def sphericalAreaCeilM2(ring: Column): Column =
    ceil(sphericalArea(ring)).cast("long")

  /** Axis-aligned bounding box of a ring as struct(xmin,ymin,xmax,ymax). */
  def bbox(ring: Column): Column = struct(
    array_min(transform(ring, px(_))).as("xmin"),
    array_min(transform(ring, py(_))).as("ymin"),
    array_max(transform(ring, px(_))).as("xmax"),
    array_max(transform(ring, py(_))).as("ymax"))
}
