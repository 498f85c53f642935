package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(s: String, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): String =
    Seq(s).toDF("t").select(c(col("t"))).head.getString(0)

  test("fixMojibake repairs the reference's two gsub cases") {
    assert(one("karhunkÃ¶ynnÃ¶s", TextFunctions.fixMojibake) == "karhunköynnös")
    assert(one("jÃ¤ttipalsami", TextFunctions.fixMojibake) == "jättipalsami")
  }

  test("subFirst replaces only the first occurrence (R sub semantics)") {
    assert(one("2026-01-02 to 2026-03-04",
      TextFunctions.subFirst(_, "2026", "2024")) == "2024-01-02 to 2026-03-04")
    assert(one("no match here", TextFunctions.subFirst(_, "2026", "2024")) == "no match here")
    // match at the very end
    assert(one("year 2026", TextFunctions.subFirst(_, "2026", "2024")) == "year 2024")
  }

  test("wordNgrams") {
    val r = Seq("a b c d").toDF("t")
      .select(TextFunctions.wordNgrams(col("t"), 2)).head.getSeq[String](0)
    assert(r == Seq("a b", "b c", "c d"))
    val short = Seq("solo").toDF("t")
      .select(TextFunctions.wordNgrams(col("t"), 3)).head.getSeq[String](0)
    assert(short.isEmpty)
  }

  test("cleanText chains mojibake -> lower -> one-shot substitution") {
    assert(one("JÃ¤ttiputki 2026 and 2026",
      TextFunctions.cleanText(_, "2026", "2024")) == "jättiputki 2024 and 2026")
  }
}
