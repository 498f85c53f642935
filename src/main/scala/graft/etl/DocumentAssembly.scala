package graft.etl

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The reference's core product: assembling each observation into a
  * nested "laji-etl" JSON document (crowdsorsa-etl-2023.R:120-173,
  * 2024.R:87-147 build the same shape with nested R lists, one row at a
  * time). Here the whole document is ONE Catalyst struct expression
  * serialized by `to_json` — null fields (notes, reportedTaxonId,
  * facts) are omitted exactly like the reference's conditional list
  * insertion, and the entire assembly is map-side: the only join is the
  * broadcast municipality lookup, so the pipeline streams at scan speed
  * at any scale.
  */
object DocumentAssembly {
  import Enrichment.CollectionId

  /** event_type → taxon URI, the 2024.R:60-71 switch. 'error' is
    * deliberately unmapped: the reference's switch yields NULL for
    * unknown taxa and the field is then absent from the JSON. */
  val TaxonMap: Map[String, String] = Map(
    "purchase" -> "http://tun.fi/MX.38947",
    "click"    -> "http://tun.fi/MX.38240",
    "view"     -> "http://tun.fi/MX.38815",
    "signup"   -> "http://tun.fi/MX.41695")

  /** The observation's polygon, in integer micro-degrees derived from
    * the row (the reference reads the real geometry off the shapefile;
    * this schema has no geometry column, so the quad is minted from
    * `value` exactly like Enrichment.geoAreaSpherical's ring). All
    * coordinate math stays in BIGINT micro-units and surfaces as
    * DECIMAL(16,6): both engines render scale-6 decimals identically
    * ("24.930010"), whereas double rendering is engine-specific —
    * the oracle replays the same integers through printf('%d.%06d'). */
  private def microDeg(c: Column): Column =
    (c.cast(DecimalType(18, 0)) * lit(new java.math.BigDecimal("0.000001")))
      .cast(DecimalType(16, 6))

  /** GeoJSON `features` array: one Feature wrapping a Polygon whose
    * single ring is the minted quad. The reference embeds the
    * MAKE-VALID geometry when the observation has a positive area and
    * the raw geometry otherwise (2023.R:74-80); validity here means
    * ring CLOSURE (first position repeated — what st_make_valid
    * repairs on an unclosed hand-drawn ring), so the area>0 branch
    * carries the closed 5-position ring and the fallback the raw open
    * 4-position one (2023.R:84-86, :155-161 insert the parsed
    * geometry under features[].geometry). */
  private def wgs84Features(vC: Column, validArea: Column): Column = {
    val lonW = lit(24930000L) + vC * 10
    val latH = lit(60171000L) + vC * 5
    val lon0 = microDeg(lit(24930000L))
    val lat0 = microDeg(lit(60170000L))
    val p00 = array(lon0, lat0)
    val pW0 = array(microDeg(lonW), lat0)
    val pWH = array(microDeg(lonW), microDeg(latH))
    val p0H = array(lon0, microDeg(latH))
    val ring = when(validArea, array(p00, pW0, pWH, p0H, p00))
      .otherwise(array(p00, pW0, pWH, p0H))
    array(struct(
      lit("Feature").as("type"),
      struct(lit("Polygon").as("type"), array(ring).as("coordinates"))
        .as("geometry")))
  }

  /** 2024 variant: EUREF (ETRS-TM35FIN) planar meters — integer
    * coordinates by nature, so the positions are plain BIGINTs. The
    * 2024 script's area is always >= 1 (GREATEST(...,1), 2024.R), so
    * the ring is always the validated closed form. */
  private def eurefFeatures(vC: Column): Column = {
    val x0 = lit(385000L)
    val y0 = lit(6672000L)
    val xW = x0 + vC
    val yH = lit(6672100L) + vC * 2
    val p00 = array(x0, y0)
    val ring = array(p00, array(xW, y0), array(xW, yH), array(x0, yH), p00)
    array(struct(
      lit("Feature").as("type"),
      struct(lit("Polygon").as("type"), array(ring).as("coordinates"))
        .as("geometry")))
  }

  /** Exact cent snap of the 2-dp `value` column: coordinate math must
    * run on integers — any double intermediate would render
    * engine-specifically inside the JSON. */
  private def valueCents: Column =
    floor(col("value") * 100.0 + 0.5).cast("long")

  /** 2023-script variant (crowdsorsa-etl-2023.R): hour/minute fields,
    * WGS84 crs, municipality via the key lookup — and NO abundance
    * fields (those are 2024-only; 2024.R:133-136). The oracled
    * instance is the PROD profile; [[DeployProfile.Test]] swaps the
    * sourceId to KE.1501 exactly as the branch switch does. */
  def assemble(t: Tables): DataFrame = assemble(t, DeployProfile.Prod)

  /** [[assemble]] under an explicit deploy profile. */
  def assemble(t: Tables, profile: DeployProfile): DataFrame = {
    val e = t.events
      .select(Enrichment.overrideKey(col("user_id")).as("obs_key"),
        col("event_id"), col("ts"), col("event_type"), col("value"))
      .join(broadcast(t.customer.select("c_custkey", "c_nationkey")),
        col("obs_key") === col("c_custkey"))
      .join(broadcast(t.nation.select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))

    val idStr = col("event_id").cast("string")
    val d = col("ts").cast("date")
    val h = hour(col("ts"))
    val m = minute(col("ts"))
    val controlled = col("value") > 120.0
    val area = ceil(col("value") - 100.0).cast("long")
    val uri = (suffix: String) =>
      format_string(s"http://tun.fi/$CollectionId/%d$suffix", col("event_id"))

    val unit = struct(
      uri("_U").as("unitId"),
      col("event_type").as("taxonVerbatim"),
      element_at(typedlit(TaxonMap), col("event_type")).as("reportedTaxonId"),
      when(controlled, array(lit("INVASIVE_PARTIAL")))
        .otherwise(array().cast("array<string>")).as("sourceTags"),
      when(area > 0, array(struct(
        lit("http://tun.fi/MY.areaInSquareMeters").as("fact"),
        area.as("integerValue"),
        area.cast("string").as("value")))).as("facts"))

    val gathering = struct(
      uri("_G").as("gatheringId"),
      struct(d.as("begin"), d.as("end")).as("eventDate"),
      h.as("hourBegin"), h.as("hourEnd"),
      m.as("minuteBegin"), m.as("minuteEnd"),
      col("n_name").as("municipality"),
      struct(
        lit("FeatureCollection").as("type"),
        lit("WGS84").as("crs"),
        wgs84Features(valueCents, area > 0).as("features")).as("geo"),
      array(unit).as("units"))

    val document = struct(
      lit("laji-etl").as("schema"),
      lit(profile.sourceUri).as("sourceId"),
      lit(s"http://tun.fi/$CollectionId").as("collectionId"),
      uri("").as("documentId"),
      struct(
        lit("PUBLIC").as("concealment"),
        array(idStr, concat(lit("crowdsorsa-"), col("n_name"))).as("keywords"),
        when(controlled,
          concat(lit("Controlled: "), d.cast("string"))).as("notes"),
        array(gathering).as("gatherings")).as("publicDocument"))

    e.select(col("event_id"), to_json(document).as("doc"))
      .orderBy(col("event_id"))
  }

  /** 2024-script variant (crowdsorsa-etl-2024.R): no hour/minute
    * fields, EUREF crs, municipality passed through directly
    * (2024.R:46), abundanceString formatted to one-decimal minimum
    * (R `format(nsmall=1)`) + RELATIVE_DENSITY, facts always present
    * (2024.R:137-144). */
  def assemble2024(t: Tables): DataFrame =
    assemble2024(t, DeployProfile.Prod)

  /** [[assemble2024]] under an explicit deploy profile. */
  def assemble2024(t: Tables, profile: DeployProfile): DataFrame = {
    val e = t.events
      .select(Enrichment.overrideKey(col("user_id")).as("obs_key"),
        col("event_id"), col("ts"), col("event_type"), col("value"))
      .join(broadcast(t.customer.select("c_custkey", "c_nationkey")),
        col("obs_key") === col("c_custkey"))
      .join(broadcast(t.nation.select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))

    val idStr = col("event_id").cast("string")
    val d = col("ts").cast("date")
    val controlled = col("value") > 120.0
    val area = greatest(ceil(col("value") - 100.0), lit(1.0)).cast("long")
    val uri = (suffix: String) =>
      format_string(s"http://tun.fi/$CollectionId/%d$suffix", col("event_id"))

    val unit = struct(
      uri("_U").as("unitId"),
      col("event_type").as("taxonVerbatim"),
      element_at(typedlit(TaxonMap), col("event_type")).as("reportedTaxonId"),
      when(controlled, array(lit("INVASIVE_PARTIAL")))
        .otherwise(array().cast("array<string>")).as("sourceTags"),
      // %.2f, not %.1f: inputs carry 2 decimals, so 2-dp formatting never
      // rounds a representable tie (Java HALF_UP vs C half-even diverge
      // on exact .x5 doubles like 185.25)
      format_string("%.2f", col("value")).as("abundanceString"),
      lit("RELATIVE_DENSITY").as("abundanceUnit"),
      array(struct(
        lit("http://tun.fi/MY.areaInSquareMeters").as("fact"),
        area.as("integerValue"),
        area.cast("string").as("value"))).as("facts"))

    val gathering = struct(
      uri("_G").as("gatheringId"),
      struct(d.as("begin"), d.as("end")).as("eventDate"),
      col("n_name").as("municipality"),
      struct(
        lit("FeatureCollection").as("type"),
        lit("EUREF").as("crs"),
        eurefFeatures(valueCents).as("features")).as("geo"),
      array(unit).as("units"))

    val document = struct(
      lit("laji-etl").as("schema"),
      lit(profile.sourceUri).as("sourceId"),
      lit(s"http://tun.fi/$CollectionId").as("collectionId"),
      uri("").as("documentId"),
      struct(
        lit("PUBLIC").as("concealment"),
        array(idStr, concat(lit("crowdsorsa-"), col("n_name"))).as("keywords"),
        when(controlled,
          concat(lit("Controlled: "), d.cast("string"))).as("notes"),
        array(gathering).as("gatherings")).as("publicDocument"))

    e.select(col("event_id"), to_json(document).as("doc"))
      .orderBy(col("event_id"))
  }
}
