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
    * Cross-engine note: parity with the DuckDB oracle rests on
    * sin/radians being bit-identical between the JVM and DuckDB's
    * libm, verified empirically over this dataset's coordinate grid.
    * The trailing ceil-to-whole-m² does NOT protect the compare — the
    * opposite: ceil is exactly where a 1-ulp divergence near an
    * integer boundary becomes a full off-by-one — so new data or a
    * different libm needs the grid re-verified (or the oracle compare
    * moved to the pre-ceil double at a coarse epsilon). */
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

  /** WGS84 semi-major axis (m) and first eccentricity squared. */
  val WgsA  = 6378137.0
  val WgsE2 = 6.69437999014e-3

  /** Snyder's authalic q (Map Projections — A Working Manual, eq 3-12):
    * sin of the authalic latitude is q(φ)/q(π/2), and the authalic
    * mapping preserves area between the WGS84 ellipsoid and the sphere
    * of radius R_q = a·√(q(π/2)/2). */
  private def qAuthalic(sinphi: Column): Column = {
    val e = math.sqrt(WgsE2)
    lit(1.0 - WgsE2) * (
      sinphi / (lit(1.0) - lit(WgsE2) * sinphi * sinphi) -
        lit(1.0 / (2.0 * e)) *
          log((lit(1.0) - lit(e) * sinphi) / (lit(1.0) + lit(e) * sinphi)))
  }

  /** Ellipsoidal (WGS84) polygon area in m²: the Chamberlain-Duquette
    * trapezoid sum evaluated in AUTHALIC latitude on the authalic
    * sphere, which algebraically reduces to
    *   A = a²/4 · |Σ_i (λ_{i+1} − λ_i)(q(φ_i) + q(φ_{i+1}))|.
    * This removes the ~0.23% sphere-vs-ellipsoid bias of
    * [[sphericalArea]] against `sf::st_area`'s WGS84 geodesic area
    * (crowdsorsa-etl-2023.R:40); the residual is the shared
    * edge-model approximation (rhumb-trapezoid edges vs geodesics),
    * negligible for survey-plot-sized features. Closed form, public
    * constants, stays entirely inside codegen'd HOFs. */
  def ellipsoidalArea(ring: Column): Column = {
    val r = closeRing(ring)
    val idx = sequence(lit(1), size(r) - 1)
    val terms = transform(idx, i =>
      (radians(px(element_at(r, i + 1))) - radians(px(element_at(r, i)))) *
        (qAuthalic(sin(radians(py(element_at(r, i))))) +
          qAuthalic(sin(radians(py(element_at(r, i + 1)))))))
    abs(aggregate(terms, lit(0.0), (a, v) => a + v)) * lit(WgsA * WgsA / 4.0)
  }

  /** Axis-aligned bounding box of a ring as struct(xmin,ymin,xmax,ymax). */
  def bbox(ring: Column): Column = struct(
    array_min(transform(ring, px(_))).as("xmin"),
    array_min(transform(ring, py(_))).as("ymin"),
    array_max(transform(ring, px(_))).as("xmax"),
    array_max(transform(ring, py(_))).as("ymax"))
}
