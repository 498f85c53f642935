package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

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

  /** Full `st_make_valid` → `st_area` path for rings that may
    * self-intersect: struct(area double, loops int). See [[MakeValidArea]]. */
  def makeValid(ring: Column): Column =
    ColumnBridge.column(MakeValidArea(ColumnBridge.expression(ring)))

  /** Even-odd repaired area, rounded up to whole m² like the reference
    * (`ceiling(st_area(st_make_valid(...)))`, 2023.R:36-40). */
  def makeValidAreaCeilM2(ring: Column): Column =
    ceil(makeValid(ring).getField("area")).cast("long")

  /** MULTIPOLYGON make_valid → area: the reference's full R2 path
    * (`st_make_valid` → cast MULTIPOLYGON → `st_area`, 2023.R:36-40)
    * over `array<array<struct<x,y>>>` — each component ring repaired
    * independently, areas summed. */
  def multiPolygonAreaValid(rings: Column): Column =
    aggregate(transform(rings, r => makeValid(r).getField("area")),
      lit(0.0), (a, v) => a + v)

  /** Register the geometry kernel for the SQL surface:
    * `graft_make_valid(ring)` → struct(area, loops). */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_make_valid", exprs => MakeValidArea(exprs.head), "built-in")
}

/** Static geometry-repair kernel, callable from generated Java.
  *
  * Mirrors GEOS/sf `st_make_valid` (linework method — the sf default the
  * reference relies on at crowdsorsa-etl-2023.R:36-38) for the defect
  * classes a hand-drawn survey polygon actually exhibits:
  *
  *   - unclosed ring               → closed
  *   - repeated consecutive vertex → dropped
  *   - self-crossing (bowtie / figure-eight, any number of crossings)
  *     → noded at each proper crossing and decomposed into simple
  *       loops; area = Σ |loop|, loops = count of nonzero-area pieces
  *       (= ST_NumGeometries of the repaired MULTIPOLYGON)
  *   - self-touch at a shared vertex → split into the touching loops
  *   - zero-width spike (out-and-back linework) → dropped (zero area)
  *
  * Out of scope (documented, not silently wrong): collinear overlapping
  * edges beyond exact out-and-back spikes, and lobes that overlap with
  * the same winding (even-odd makes the doubly-covered region a hole;
  * this kernel, like a bowtie-only repair, sums the pieces). Both are
  * degenerate beyond what crowd-drawn quads produce.
  *
  * Numerics: each crossing point is computed ONCE per segment pair and
  * the identical doubles are inserted into both segments' split lists,
  * so loop extraction can key vertices on exact equality — no epsilon
  * snapping, no grid quantization.
  */
object GraftGeo {

  /** Decompose a (possibly self-intersecting) ring; return
    * InternalRow(evenOddArea: Double, loopCount: Int). */
  def makeValidArea(arr: ArrayData): InternalRow = {
    val n0 = arr.numElements()
    // 1. extract vertices, dropping consecutive duplicates
    val xs = new mutable.ArrayBuffer[Double](n0)
    val ys = new mutable.ArrayBuffer[Double](n0)
    var i = 0
    while (i < n0) {
      // skip null vertices and null coordinates outright (a malformed
      // SQL-surface argument) instead of NPEing inside codegen
      if (!arr.isNullAt(i)) {
        val p = arr.getStruct(i, 2)
        if (!p.isNullAt(0) && !p.isNullAt(1)) {
          val x = p.getDouble(0); val y = p.getDouble(1)
          if (xs.isEmpty || xs.last != x || ys.last != y) { xs += x; ys += y }
        }
      }
      i += 1
    }
    // treat the ring as cyclic: drop an explicit closing vertex
    if (xs.length >= 2 && xs.head == xs.last && ys.head == ys.last) {
      xs.remove(xs.length - 1); ys.remove(ys.length - 1)
    }
    val m = xs.length
    if (m < 3) return new GenericInternalRow(Array[Any](0.0, 0))

    // 2. node: for each segment k (vertex k -> k+1 mod m), collect
    //    interior split points as (t, x, y), t the segment parameter
    val splits = Array.fill(m)(new mutable.ArrayBuffer[(Double, Double, Double)]())
    i = 0
    while (i < m) {
      val ax = xs(i); val ay = ys(i)
      val bx = xs((i + 1) % m); val by = ys((i + 1) % m)
      val rx = bx - ax; val ry = by - ay
      var j = i + 1
      while (j < m) {
        val adjacent = j == i + 1 || (i == 0 && j == m - 1)
        if (!adjacent) {
          val cx = xs(j); val cy = ys(j)
          val dx = xs((j + 1) % m); val dy = ys((j + 1) % m)
          val sx = dx - cx; val sy = dy - cy
          val denom = rx * sy - ry * sx
          if (denom != 0.0) {
            val t = ((cx - ax) * sy - (cy - ay) * sx) / denom
            val u = ((cx - ax) * ry - (cy - ay) * rx) / denom
            if (t > 0.0 && t < 1.0 && u > 0.0 && u < 1.0) {
              // proper crossing: one point, identical doubles both sides
              val px = ax + t * rx; val py = ay + t * ry
              splits(i) += ((t, px, py))
              splits(j) += ((u, px, py))
            } else if (u > 0.0 && u < 1.0 && (t == 0.0 || t == 1.0)) {
              // an endpoint of segment i lies on the interior of j:
              // split j at that (exact) vertex so the walk can pinch there
              if (t == 0.0) splits(j) += ((u, ax, ay))
              else splits(j) += ((u, bx, by))
            } else if (t > 0.0 && t < 1.0 && (u == 0.0 || u == 1.0)) {
              if (u == 0.0) splits(i) += ((t, cx, cy))
              else splits(i) += ((t, dx, dy))
            }
          }
        }
        j += 1
      }
      i += 1
    }

    // 3. noded closed walk: original vertices + ordered split points
    val wx = new mutable.ArrayBuffer[Double](m + 4)
    val wy = new mutable.ArrayBuffer[Double](m + 4)
    i = 0
    while (i < m) {
      if (wx.isEmpty || wx.last != xs(i) || wy.last != ys(i)) { wx += xs(i); wy += ys(i) }
      val s = splits(i).sortBy(_._1)
      var k = 0
      while (k < s.length) {
        val (_, px, py) = s(k)
        if (wx.last != px || wy.last != py) { wx += px; wy += py }
        k += 1
      }
      i += 1
    }
    wx += xs(0); wy += ys(0) // close the walk

    // 4. extract simple loops: every revisited vertex pinches one off
    var area = 0.0
    var loops = 0
    val seen = new java.util.HashMap[(Double, Double), Integer]()
    val px = new mutable.ArrayBuffer[Double](wx.length)
    val py = new mutable.ArrayBuffer[Double](wx.length)
    i = 0
    while (i < wx.length) {
      val key = (wx(i), wy(i))
      val at = seen.get(key)
      if (at != null) {
        val k = at.intValue()
        // loop = stack(k..end) closed back to stack(k); shoelace it
        var s2 = 0.0
        var q = k
        while (q < px.length) {
          val qn = if (q + 1 < px.length) q + 1 else k
          s2 += px(q) * py(qn) - px(qn) * py(q)
          q += 1
        }
        val a = math.abs(s2) / 2.0
        if (a > 0.0) { area += a; loops += 1 }
        while (px.length > k + 1) {
          seen.remove((px.last, py.last))
          px.remove(px.length - 1); py.remove(py.length - 1)
        }
      } else {
        seen.put(key, Integer.valueOf(px.length))
        px += wx(i); py += wy(i)
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](area, loops))
  }
}

/** `st_make_valid` → area as a native Catalyst expression over
  * `array<struct<x:double,y:double>>`, returning
  * `struct<area:double, loops:int>` — `area` is the even-odd repaired
  * area (what `sf::st_area(st_make_valid(g))` reports for a bowtie),
  * `loops` the piece count of the repaired MULTIPOLYGON. Codegen emits
  * a single static kernel call, so the expression stays inside
  * whole-stage codegen like the other graft kernels (no UDF, no Row
  * boxing beyond Catalyst's own InternalRow). */
case class MakeValidArea(child: Expression) extends UnaryExpression {
  // declared input check: a SQL caller passing anything but a vertex
  // array (the engine-wide struct<x:double,y:double> convention) gets
  // an analysis-time type error, not a codegen ClassCastException
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StructType(
            Array(StructField(_, DoubleType, _, _), StructField(_, DoubleType, _, _))), _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_make_valid requires array<struct<x:double,y:double>>, " +
            s"got ${other.catalogString}")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("area", DoubleType, nullable = false),
    StructField("loops", IntegerType, nullable = false)))
  override def nullSafeEval(input: Any): Any =
    GraftGeo.makeValidArea(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftGeo.makeValidArea($c)")
  override protected def withNewChildInternal(newChild: Expression): MakeValidArea =
    copy(child = newChild)
  override def prettyName: String = "graft_make_valid_area"
}
