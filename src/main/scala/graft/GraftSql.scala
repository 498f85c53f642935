package graft

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL surface of the engine: the test tables as temp views plus
  * graft's custom functions in the session registry, so every
  * capability is reachable from `spark.sql(...)` as well as the
  * DataFrame API.
  */
object GraftSql {

  def registerViews(spark: SparkSession, dir: String): Unit =
    Tables(spark, dir).all.foreach { case (name, df) =>
      df.createOrReplaceTempView(name)
    }

  def register(spark: SparkSession, dir: String): Unit = {
    registerViews(spark, dir)
    functions.HashFunctions.registerAll(spark)
    functions.GeoFunctions.registerAll(spark)
  }

  def query(spark: SparkSession, dir: String, sql: String): DataFrame = {
    register(spark, dir)
    spark.sql(sql)
  }

  /** SQL-TEXT `MERGE INTO` over graft tables (r17) — the statement
    * form of [[graft.sinks.SnapshotStore.mergeInto]], so the full
    * conditional merge is reachable without touching the library API
    * (Spark's own parser reserves MERGE INTO for catalog tables with
    * row-level-operation support, which a V1 path-addressed source
    * cannot register — the same reason Delta on Spark 3.x shipped its
    * own MERGE parser):
    *
    * {{{
    *   MERGE INTO '<table path>' AS t
    *   USING <temp view or (subquery)> AS s
    *   ON t.<key> = s.<key>
    *   WHEN MATCHED [AND <cond>] THEN UPDATE SET col = <expr>, ...
    *   WHEN MATCHED [AND <cond>] THEN DELETE
    *   WHEN NOT MATCHED [AND <cond>] THEN INSERT *
    * }}}
    *
    * Clause conditions/assignments are passed through verbatim (they
    * are already SQL over `t.`/`s.` — the mergeInto contract); clause
    * order is preserved (first-match-wins). The target is a quoted
    * PATH; the source resolves through `spark.table` / `spark.sql`.
    * Returns the committed version. */
  def merge(spark: SparkSession, sql: String): Long = {
    import graft.sinks.SnapshotStore
    val s = sql.trim.stripSuffix(";")
    val head = ("""(?is)^MERGE\s+INTO\s+'([^']+)'(?:\s+AS)?\s+t\s+""" +
      """USING\s+(.+?)(?:\s+AS)?\s+s\s+""" +
      """ON\s+t\.(\w+)\s*=\s*s\.(\w+)\s*(WHEN\s.*)$""").r
    val (path, sourceTxt, keyT, keyS, clausesTxt) = s match {
      case head(p, src, kt, ks, rest) => (p, src.trim, kt, ks, rest)
      case _ => throw new IllegalArgumentException(
        "GraftSql.merge: expected MERGE INTO '<path>' [AS] t USING " +
          "<view|(subquery)> [AS] s ON t.<key> = s.<key> WHEN ...")
    }
    require(keyT == keyS,
      s"GraftSql.merge: ON must equi-join one shared key column, got " +
        s"t.$keyT = s.$keyS")
    val source =
      if (sourceTxt.startsWith("(")) spark.sql(
        sourceTxt.stripPrefix("(").stripSuffix(")"))
      else spark.table(sourceTxt)
    // split the WHEN ladder; each clause parses independently
    val clauseRe =
      """(?is)WHEN\s+(NOT\s+)?MATCHED\s*(?:AND\s+(.*?))?\s*THEN\s+""" +
        """(UPDATE\s+SET\s+(.*?)|DELETE|INSERT\s+\*)\s*(?=WHEN\s|$)"""
    val found = clauseRe.r.findAllMatchIn(clausesTxt).toSeq
    require(found.nonEmpty && found.map(_.matched.length).sum >=
      clausesTxt.trim.length - 5,
      s"GraftSql.merge: unparseable WHEN clause(s) in: $clausesTxt")
    var matched = Seq.empty[SnapshotStore.MatchedAction]
    var notMatched: Option[SnapshotStore.MergeInsert] = None
    found.foreach { m =>
      val isNot = m.group(1) != null
      val cond = Option(m.group(2)).map(_.trim).filter(_.nonEmpty)
      val action = m.group(3).trim
      (isNot, action.toUpperCase.take(6)) match {
        case (false, u) if u.startsWith("UPDATE") =>
          // SET a = <expr>, b = <expr> — split on top-level commas
          // (commas inside parens/quotes belong to the expression)
          val sets = splitTopLevel(m.group(4)).map { kv =>
            val i = kv.indexOf('=')
            require(i > 0, s"GraftSql.merge: malformed SET item '$kv'")
            kv.take(i).trim -> kv.drop(i + 1).trim
          }
          matched :+= SnapshotStore.MergeUpdate(sets.toMap, cond)
        case (false, "DELETE") =>
          matched :+= SnapshotStore.MergeDelete(cond)
        case (true, "INSERT") =>
          require(notMatched.isEmpty,
            "GraftSql.merge: at most one WHEN NOT MATCHED clause")
          notMatched = Some(SnapshotStore.MergeInsert(cond))
        case _ => throw new IllegalArgumentException(
          s"GraftSql.merge: unsupported clause '${m.matched.take(60)}'")
      }
    }
    SnapshotStore.mergeInto(spark, path, source, keyT, matched, notMatched)
  }

  /** Split on commas not nested in parens or single quotes. */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; var inQ = false; var start = 0
    s.indices.foreach { i =>
      s(i) match {
        case '\'' => inQ = !inQ
        case '(' if !inQ => depth += 1
        case ')' if !inQ => depth -= 1
        case ',' if !inQ && depth == 0 =>
          out += s.substring(start, i); start = i + 1
        case _ => ()
      }
    }
    out += s.substring(start)
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }
}
