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
}
