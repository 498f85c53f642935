package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DocumentAssemblySpec extends SparkSpec {

  test("documents are valid JSON with the laji-etl shape") {
    val docs = DocumentAssembly.assemble(tables).limit(50).collect()
    assert(docs.length == 50)
    docs.foreach { r =>
      val parsed = spark.range(1).select(
        from_json(lit(r.getString(1)),
          schema_of_json(lit(r.getString(1)))).as("j"))
      assert(parsed.select("j.schema").head.getString(0) == "laji-etl")
    }
  }

  test("null-driven omission mirrors the reference's conditional lists") {
    val all = DocumentAssembly.assemble(tables).collect().map(_.getString(1))
    // notes present iff controlled (value > 120)
    val withNotes = all.filter(_.contains("\"notes\""))
    assert(withNotes.nonEmpty && withNotes.forall(_.contains("INVASIVE_PARTIAL")))
    val without = all.filterNot(_.contains("\"notes\""))
    assert(without.nonEmpty && without.forall(_.contains("\"sourceTags\":[]")))
    // 'error' taxon is unmapped -> reportedTaxonId absent (switch -> NULL)
    val errorDocs = all.filter(_.contains("\"taxonVerbatim\":\"error\""))
    assert(errorDocs.nonEmpty && errorDocs.forall(!_.contains("reportedTaxonId")))
  }

  test("deploy profile switch: prod vs test documents differ ONLY in sourceId") {
    // 2023.R:13-27 — branch != main flips api host, source id, token
    // env together; the assembled document carries the source switch
    val prod = DocumentAssembly.assemble(tables, DeployProfile.Prod)
      .limit(20).collect().map(_.getString(1))
    val test = DocumentAssembly.assemble(tables, DeployProfile.Test)
      .limit(20).collect().map(_.getString(1))
    prod.zip(test).foreach { case (p, tst) =>
      assert(p.contains("\"sourceId\":\"http://tun.fi/KE.1721\""))
      assert(tst.contains("\"sourceId\":\"http://tun.fi/KE.1501\""))
      assert(tst.replace("KE.1501", "KE.1721") == p)
    }
    // 2024 variant under the same switch
    val t24 = DocumentAssembly.assemble2024(tables, DeployProfile.Test)
      .limit(5).collect().map(_.getString(1))
    assert(t24.forall(_.contains("\"sourceId\":\"http://tun.fi/KE.1501\"")))
    // branch selection mirrors the R condition exactly
    assert(DeployProfile.forBranch("main") == DeployProfile.Prod)
    assert(DeployProfile.forBranch("feature/x") == DeployProfile.Test)
    // the profile triple stays coupled
    assert(DeployProfile.Test.pushUrl ==
      "https://apitest.laji.fi/v0/warehouse/push")
    assert(DeployProfile.Test.token(Map("FINBIF_DEV_ACCESS_TOKEN" -> "d",
      "FINBIF_ACCESS_TOKEN" -> "p")) == "d")
    // the deterministic fallback is TEST-only; an unset prod token fails fast
    assert(DeployProfile.Test.token(Map.empty) == "SECRET123")
    assert(DeployProfile.Prod.token(Map("FINBIF_ACCESS_TOKEN" -> "p")) == "p")
    intercept[IllegalStateException] { DeployProfile.Prod.token(Map.empty) }
  }

  test("golden documents: byte-exact JSON for hand-built rows (both script variants)") {
    // Five rows covering every conditional branch of the assembly
    // (2023.R:110-179, 2024.R:87-147): controlled/uncontrolled, facts
    // present/omitted, unmapped taxon, and the key override. Expected
    // strings are hand-derived from the reference's nested-list
    // insertion order — this pins struct-field order, null omission,
    // value formatting, and ID minting byte-for-byte.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-golden").toString
    val tNs = 1705314600000000000L // 2024-01-15 10:30:00 UTC, as TIMESTAMP(NANOS)
    Seq(
      (1L, 1L, tNs, "purchase", 150.25), // controlled, area 51
      (2L, 2L, tNs, "click", 100.5),     // area ceil(0.5)=1
      (3L, 3L, tNs, "view", 95.0),       // area<=0 -> 2023 facts omitted
      (4L, 4L, tNs, "error", 120.0),     // unmapped taxon; 120 NOT controlled
      (5L, 13L, tNs, "signup", 130.0)    // key override 13 -> 20
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    Seq((1L, 101L), (2L, 102L), (3L, 103L), (4L, 104L), (20L, 105L))
      .toDF("c_custkey", "c_nationkey").write.parquet(s"$dir/customer.parquet")
    Seq((101L, "espoo"), (102L, "vantaa"), (103L, "turku"), (104L, "oulu"), (105L, "tampere"))
      .toDF("n_nationkey", "n_name").write.parquet(s"$dir/nation.parquet")
    val t = graft.sources.Tables(spark, dir)

    def doc(id: Long, muni: String, publicTail: String): String =
      s"""{"schema":"laji-etl","sourceId":"http://tun.fi/KE.1721","collectionId":"http://tun.fi/HR.5835",""" +
        s""""documentId":"http://tun.fi/HR.5835/$id","publicDocument":{"concealment":"PUBLIC",""" +
        s""""keywords":["$id","crowdsorsa-$muni"]$publicTail}}"""
    // ring coordinates: lon span value*0.001°, lat span value*0.0005°
    // from (24.93, 60.171); closed (5 positions) iff area > 0 — the
    // reference's validated-geometry branch (2023.R:74-80).
    def geo23(lonw: String, lath: String, closed: Boolean): String =
      s""""geo":{"type":"FeatureCollection","crs":"WGS84","features":[{"type":"Feature","geometry":""" +
        s"""{"type":"Polygon","coordinates":[[[24.930000,60.170000],[$lonw,60.170000],[$lonw,$lath],[24.930000,$lath]""" +
        (if (closed) ",[24.930000,60.170000]" else "") + "]]}}]}"
    def gath23(id: Long, muni: String, geoStr: String, unitTail: String): String =
      s""""gatherings":[{"gatheringId":"http://tun.fi/HR.5835/${id}_G","eventDate":{"begin":"2024-01-15","end":"2024-01-15"},""" +
        s""""hourBegin":10,"hourEnd":10,"minuteBegin":30,"minuteEnd":30,"municipality":"$muni",""" +
        geoStr + s""","units":[{"unitId":"http://tun.fi/HR.5835/${id}_U"$unitTail}]}]"""
    def facts(a: Long): String =
      s""","facts":[{"fact":"http://tun.fi/MY.areaInSquareMeters","integerValue":$a,"value":"$a"}]"""

    val expected2023 = Map(
      1L -> doc(1, "espoo", ""","notes":"Controlled: 2024-01-15",""" + gath23(1, "espoo",
        geo23("25.080250", "60.246125", closed = true), // vc=15025
        ""","taxonVerbatim":"purchase","reportedTaxonId":"http://tun.fi/MX.38947","sourceTags":["INVASIVE_PARTIAL"]""" + facts(51))),
      2L -> doc(2, "vantaa", "," + gath23(2, "vantaa",
        geo23("25.030500", "60.221250", closed = true), // vc=10050
        ""","taxonVerbatim":"click","reportedTaxonId":"http://tun.fi/MX.38240","sourceTags":[]""" + facts(1))),
      3L -> doc(3, "turku", "," + gath23(3, "turku",
        geo23("25.025000", "60.218500", closed = false), // area<=0: raw open ring
        ""","taxonVerbatim":"view","reportedTaxonId":"http://tun.fi/MX.38815","sourceTags":[]""")),
      4L -> doc(4, "oulu", "," + gath23(4, "oulu",
        geo23("25.050000", "60.231000", closed = true), // vc=12000
        ""","taxonVerbatim":"error","sourceTags":[]""" + facts(20))),
      5L -> doc(5, "tampere", ""","notes":"Controlled: 2024-01-15",""" + gath23(5, "tampere",
        geo23("25.060000", "60.236000", closed = true), // vc=13000
        ""","taxonVerbatim":"signup","reportedTaxonId":"http://tun.fi/MX.41695","sourceTags":["INVASIVE_PARTIAL"]""" + facts(30))))
    val got2023 = DocumentAssembly.assemble(t)
      .as[(Long, String)].collect().toMap
    expected2023.foreach { case (id, exp) =>
      assert(got2023(id) == exp, s"2023 doc $id:\n got ${got2023(id)}\n exp $exp")
    }

    // 2024 coordinates are EUREF planar meters (integers); area is
    // always >= 1 so the ring is always the closed validated form.
    def geo24(xw: Long, yh: Long): String =
      s""""geo":{"type":"FeatureCollection","crs":"EUREF","features":[{"type":"Feature","geometry":""" +
        s"""{"type":"Polygon","coordinates":[[[385000,6672000],[$xw,6672000],[$xw,$yh],[385000,$yh],[385000,6672000]]]}}]}"""
    def gath24(id: Long, muni: String, geoStr: String, unitTail: String): String =
      s""""gatherings":[{"gatheringId":"http://tun.fi/HR.5835/${id}_G","eventDate":{"begin":"2024-01-15","end":"2024-01-15"},""" +
        s""""municipality":"$muni",""" + geoStr +
        s""","units":[{"unitId":"http://tun.fi/HR.5835/${id}_U"$unitTail}]}]"""
    val expected2024 = Map(
      2L -> doc(2, "vantaa", "," + gath24(2, "vantaa",
        geo24(395050L, 6692200L), // vc=10050
        ""","taxonVerbatim":"click","reportedTaxonId":"http://tun.fi/MX.38240","sourceTags":[],"abundanceString":"100.50","abundanceUnit":"RELATIVE_DENSITY"""" + facts(1))),
      3L -> doc(3, "turku", "," + gath24(3, "turku",
        geo24(394500L, 6691100L), // vc=9500
        ""","taxonVerbatim":"view","reportedTaxonId":"http://tun.fi/MX.38815","sourceTags":[],"abundanceString":"95.00","abundanceUnit":"RELATIVE_DENSITY"""" + facts(1))))
    val got2024 = DocumentAssembly.assemble2024(t)
      .as[(Long, String)].collect().toMap
    expected2024.foreach { case (id, exp) =>
      assert(got2024(id) == exp, s"2024 doc $id:\n got ${got2024(id)}\n exp $exp")
    }
  }
}
