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
    // head: everything up to USING is regular; the USING operand is
    // parsed with the paren-aware scanner (a subquery may contain
    // ' AS s ' or ' ON ' internally — a flat regex would cut there)
    val intro = """(?is)^MERGE\s+INTO\s+'([^']+)'(?:\s+AS)?\s+t\s+USING\s+(.*)$""".r
    val (path, afterUsing) = s match {
      case intro(p, rest) => (p, rest.trim)
      case _ => throw new IllegalArgumentException(
        "GraftSql.merge: expected MERGE INTO '<path>' [AS] t USING " +
          "<view|(subquery)> [AS] s ON t.<key> = s.<key> WHEN ...")
    }
    val (sourceTxt, afterSource) =
      if (afterUsing.startsWith("(")) {
        val close = matchingParen(afterUsing, 0)
        (afterUsing.substring(0, close + 1), afterUsing.substring(close + 1))
      } else {
        val i = afterUsing.indexWhere(_.isWhitespace)
        require(i > 0, "GraftSql.merge: nothing after USING")
        afterUsing.splitAt(i)
      }
    val tail = """(?is)^\s*(?:AS\s+)?s\s+ON\s+t\.(\w+)\s*=\s*s\.(\w+)\s*(WHEN\s.*)$""".r
    val (keyT, keyS, clausesTxt) = afterSource match {
      case tail(kt, ks, rest) => (kt, ks, rest)
      case _ => throw new IllegalArgumentException(
        "GraftSql.merge: expected [AS] s ON t.<key> = s.<key> WHEN ... " +
          s"after the USING operand, got: ${afterSource.trim.take(80)}")
    }
    require(keyT == keyS,
      s"GraftSql.merge: ON must equi-join one shared key column, got " +
        s"t.$keyT = s.$keyS")
    val source =
      if (sourceTxt.startsWith("(")) spark.sql(
        sourceTxt.stripPrefix("(").stripSuffix(")"))
      else spark.table(sourceTxt)
    // split the WHEN ladder at TOP-LEVEL `WHEN` keywords — the scanner
    // tracks parens, quotes, and CASE…END nesting, so a clause
    // condition or SET expression containing CASE WHEN … THEN parses
    // intact (r18, closing the flat-regex mis-tokenization); coverage
    // is exact by construction (the splits partition the string).
    val clauses = splitAtTopLevelWhen(clausesTxt)
    require(clauses.nonEmpty,
      s"GraftSql.merge: no WHEN clause in: ${clausesTxt.take(80)}")
    var matched = Seq.empty[SnapshotStore.MatchedAction]
    var notMatched: Option[SnapshotStore.MergeInsert] = None
    val clauseHead = """(?is)^WHEN\s+(NOT\s+)?MATCHED\s*(.*)$""".r
    clauses.foreach { c =>
      val (isNot, rest) = c match {
        case clauseHead(n, r) => (n != null, r)
        case _ => throw new IllegalArgumentException(
          s"GraftSql.merge: unparseable WHEN clause '${c.take(60)}'")
      }
      // the clause's own THEN is the first top-level THEN (CASE-depth
      // 0) — an inner CASE WHEN…THEN never terminates the condition
      val ti = topLevelKeywordIndex(rest, "THEN")
      require(ti >= 0, s"GraftSql.merge: clause without THEN: '${c.take(60)}'")
      val condPart = rest.take(ti).trim
      val cond =
        if (condPart.isEmpty) None
        else {
          require(condPart.toUpperCase.startsWith("AND") &&
            (condPart.length == 3 || condPart(3).isWhitespace),
            s"GraftSql.merge: expected AND <cond> before THEN, got '$condPart'")
          Some(condPart.drop(3).trim).filter(_.nonEmpty)
        }
      val action = rest.drop(ti + 4).trim
      val u = action.toUpperCase
      (isNot, u) match {
        case (false, a) if a.startsWith("UPDATE") =>
          val setTxt = """(?is)^UPDATE\s+SET\s+(.*)$""".r
          val items = action match {
            case setTxt(body) => splitTopLevel(body)
            case _ => throw new IllegalArgumentException(
              s"GraftSql.merge: malformed UPDATE clause '${action.take(60)}'")
          }
          // SET a = <expr>, … — split on top-level commas (commas in
          // parens/quotes belong to the expression); the LHS is a bare
          // column name, so the first '=' is the assignment
          val sets = items.map { kv =>
            val i = kv.indexOf('=')
            require(i > 0, s"GraftSql.merge: malformed SET item '$kv'")
            kv.take(i).trim -> kv.drop(i + 1).trim
          }
          matched :+= SnapshotStore.MergeUpdate(sets.toMap, cond)
        case (false, "DELETE") =>
          matched :+= SnapshotStore.MergeDelete(cond)
        case (true, a) if a.matches("""INSERT\s*\*""") =>
          require(notMatched.isEmpty,
            "GraftSql.merge: at most one WHEN NOT MATCHED clause")
          notMatched = Some(SnapshotStore.MergeInsert(cond))
        case _ => throw new IllegalArgumentException(
          s"GraftSql.merge: unsupported clause '${c.take(60)}'")
      }
    }
    SnapshotStore.mergeInto(spark, path, source, keyT, matched, notMatched)
  }

  /** SQL-text RESTORE (r18) — the statement form of
    * [[graft.sinks.SnapshotStore.restore]], matching MERGE's surface:
    *
    * {{{ RESTORE TABLE '<table path>' TO VERSION [AS OF] <n> }}}
    *
    * Republishes the version as the new head (metadata-only commit,
    * deletion-vector reset, keyed CDC classifies the rollback).
    * Returns the new version. */
  def restore(spark: SparkSession, sql: String): Long = {
    val re = ("""(?is)^RESTORE\s+TABLE\s+'([^']+)'\s+TO\s+VERSION""" +
      """(?:\s+AS\s+OF)?\s+(\d+)\s*;?\s*$""").r
    sql.trim match {
      case re(p, v) => graft.sinks.SnapshotStore.restore(spark, p, v.toLong)
      case _ => throw new IllegalArgumentException(
        "GraftSql.restore: expected RESTORE TABLE '<path>' TO VERSION " +
          "[AS OF] <n>")
    }
  }

  /** SQL-text row-level DELETE (r18) — the statement form of
    * [[graft.sinks.SnapshotStore.deleteWhere]]:
    *
    * {{{ DELETE FROM '<table path>' WHERE <cond> }}}
    *
    * Rows where the predicate is TRUE leave the table (NULL keeps the
    * row); only files holding a match are rewritten. Returns the
    * committed version. */
  def delete(spark: SparkSession, sql: String): Long = {
    val re = """(?is)^DELETE\s+FROM\s+'([^']+)'\s+WHERE\s+(.+?)\s*;?\s*$""".r
    sql.trim match {
      case re(p, cond) => graft.sinks.SnapshotStore.deleteWhere(spark, p, cond)
      case _ => throw new IllegalArgumentException(
        "GraftSql.delete: expected DELETE FROM '<path>' WHERE <cond>")
    }
  }

  /** SQL-text row-level UPDATE (r18) — the statement form of
    * [[graft.sinks.SnapshotStore.updateWhere]]:
    *
    * {{{ UPDATE '<table path>' SET col = <expr>, ... WHERE <cond> }}}
    *
    * Assignments/condition are SQL over the table's logical columns;
    * the WHERE is found with the CASE-aware scanner, so CASE WHEN …
    * END expressions in SET parse intact. Returns the version. */
  def update(spark: SparkSession, sql: String): Long = {
    val s = sql.trim.stripSuffix(";")
    val head = """(?is)^UPDATE\s+'([^']+)'\s+SET\s+(.*)$""".r
    val (path, rest) = s match {
      case head(p, r) => (p, r)
      case _ => throw new IllegalArgumentException(
        "GraftSql.update: expected UPDATE '<path>' SET col = <expr>, " +
          "... WHERE <cond>")
    }
    val wi = topLevelKeywordIndex(rest, "WHERE")
    require(wi >= 0, "GraftSql.update: missing WHERE (a full-table " +
      "update must say WHERE true explicitly)")
    val sets = splitTopLevel(rest.take(wi)).map { kv =>
      val i = kv.indexOf('=')
      require(i > 0, s"GraftSql.update: malformed SET item '$kv'")
      kv.take(i).trim -> kv.drop(i + 1).trim
    }
    val cond = rest.drop(wi + 5).trim
    require(cond.nonEmpty, "GraftSql.update: empty WHERE condition")
    graft.sinks.SnapshotStore.updateWhere(spark, path, sets.toMap, cond)
  }

  /** SQL-text maintenance statements (r18) — completing the table
    * DDL/DML surface so every table-layer verb is reachable as a
    * statement (the Delta statement set):
    *
    * {{{
    *   OPTIMIZE '<path>' [ZORDER BY (c1, c2[, ...])]
    *   VACUUM '<path>' [RETAIN <n> VERSIONS]
    *   DESCRIBE HISTORY '<path>'
    * }}}
    *
    * OPTIMIZE without ZORDER compacts sorted by the table's stats key
    * when one is tracked; with ZORDER it is the multi-dim clustered
    * rewrite. VACUUM defaults to 2 retained versions and runs the
    * deletion-vector GC overload. Returns the new version (OPTIMIZE),
    * dropped file count (VACUUM). */
  def optimize(spark: SparkSession, sql: String): Long = {
    import graft.sinks.SnapshotStore
    val z = ("""(?is)^OPTIMIZE\s+'([^']+)'\s+ZORDER\s+BY\s*""" +
      """\(\s*([\w\s,]+?)\s*\)\s*;?\s*$""").r
    val plain = """(?is)^OPTIMIZE\s+'([^']+)'\s*;?\s*$""".r
    sql.trim match {
      case z(p, dims) =>
        SnapshotStore.compactZOrdered(spark, p,
          dims.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      case plain(p) => SnapshotStore.compact(spark, p)
      case _ => throw new IllegalArgumentException(
        "GraftSql.optimize: expected OPTIMIZE '<path>' [ZORDER BY (c, ...)]")
    }
  }

  def vacuum(spark: SparkSession, sql: String): Long = {
    import graft.sinks.SnapshotStore
    val re = ("""(?is)^VACUUM\s+'([^']+)'""" +
      """(?:\s+RETAIN\s+(\d+)\s+VERSIONS)?\s*;?\s*$""").r
    sql.trim match {
      case re(p, n) =>
        SnapshotStore.vacuum(spark, p, Option(n).map(_.toInt).getOrElse(2))
      case _ => throw new IllegalArgumentException(
        "GraftSql.vacuum: expected VACUUM '<path>' [RETAIN <n> VERSIONS]")
    }
  }

  def describeHistory(spark: SparkSession, sql: String): DataFrame = {
    val re = """(?is)^DESCRIBE\s+HISTORY\s+'([^']+)'\s*;?\s*$""".r
    sql.trim match {
      case re(p) => graft.sinks.SnapshotStore.history(spark, p)
      case _ => throw new IllegalArgumentException(
        "GraftSql.describeHistory: expected DESCRIBE HISTORY '<path>'")
    }
  }

  /** Statement DISPATCH (r18): route any graft table statement to its
    * handler by leading keyword — one entry point for a SQL shell.
    * Mutations return a 1-row (version) frame; DESCRIBE HISTORY
    * returns the history frame. */
  def statement(spark: SparkSession, sql: String): DataFrame = {
    import spark.implicits._
    val s = sql.trim
    val kw = s.takeWhile(!_.isWhitespace).toUpperCase
    kw match {
      case "MERGE"    => Seq(merge(spark, s)).toDF("version")
      case "RESTORE"  => Seq(restore(spark, s)).toDF("version")
      case "UPDATE"   => Seq(update(spark, s)).toDF("version")
      case "DELETE"   => Seq(delete(spark, s)).toDF("version")
      case "OPTIMIZE" => Seq(optimize(spark, s)).toDF("version")
      case "VACUUM"   => Seq(vacuum(spark, s)).toDF("dropped_files")
      case "DESCRIBE" => describeHistory(spark, s)
      case _ => throw new IllegalArgumentException(
        s"GraftSql.statement: unsupported statement '$kw' - " +
          "MERGE/RESTORE/UPDATE/DELETE/OPTIMIZE/VACUUM/DESCRIBE HISTORY")
    }
  }

  /** Index of the close paren matching the open paren at `open`,
    * quote-aware. */
  private def matchingParen(s: String, open: Int): Int = {
    require(s(open) == '(', s"expected '(' at $open")
    var depth = 0; var inQ = false; var i = open
    while (i < s.length) {
      s(i) match {
        case '\'' => inQ = !inQ
        case '(' if !inQ => depth += 1
        case ')' if !inQ =>
          depth -= 1
          if (depth == 0) return i
        case _ => ()
      }
      i += 1
    }
    throw new IllegalArgumentException(
      s"GraftSql.merge: unbalanced parens in '${s.take(60)}'")
  }

  /** Case-insensitive word occurrences of `kw` in `s` that sit at
    * paren-depth 0, outside single quotes, and outside any CASE…END
    * expression. */
  private def topLevelKeywordIndices(s: String, kw: String): Seq[Int] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var depth = 0; var caseDepth = 0; var inQ = false; var i = 0
    def isWordChar(c: Char) = c.isLetterOrDigit || c == '_'
    def wordAt(j: Int, w: String): Boolean =
      j + w.length <= s.length &&
        s.regionMatches(true, j, w, 0, w.length) &&
        (j == 0 || !isWordChar(s(j - 1))) &&
        (j + w.length == s.length || !isWordChar(s(j + w.length)))
    while (i < s.length) {
      s(i) match {
        case '\'' => inQ = !inQ; i += 1
        case '(' if !inQ => depth += 1; i += 1
        case ')' if !inQ => depth -= 1; i += 1
        case _ if !inQ && depth == 0 && wordAt(i, "CASE") =>
          caseDepth += 1; i += 4
        case _ if !inQ && depth == 0 && caseDepth > 0 && wordAt(i, "END") =>
          caseDepth -= 1; i += 3
        case _ if !inQ && depth == 0 && caseDepth == 0 && wordAt(i, kw) =>
          out += i; i += kw.length
        case _ => i += 1
      }
    }
    out.toSeq
  }

  private def topLevelKeywordIndex(s: String, kw: String): Int =
    topLevelKeywordIndices(s, kw).headOption.getOrElse(-1)

  /** Partition `s` into WHEN clauses at top-level WHEN keywords; the
    * splits cover the string exactly (no coverage heuristic needed). */
  private def splitAtTopLevelWhen(s: String): Seq[String] = {
    val starts = topLevelKeywordIndices(s, "WHEN")
    require(starts.headOption.contains(s.indexWhere(!_.isWhitespace)),
      s"GraftSql.merge: expected WHEN at the start of: ${s.trim.take(60)}")
    starts.zipAll(starts.drop(1), -1, s.length).map {
      case (a, b) => s.substring(a, b).trim
    }
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
