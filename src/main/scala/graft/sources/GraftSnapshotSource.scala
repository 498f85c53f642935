package graft.sources

import graft.sinks.SnapshotStore
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SaveMode}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** The SnapshotStore table layer as a REGISTERED Spark data source —
  * the idiomatic read/write surface, so a user never has to call the
  * library API to consume a graft table:
  *
  * {{{
  *   df.write.format("graft").option("statsKey", "id").save(path)
  *   spark.read.format("graft").load(path)                  // head
  *   spark.read.format("graft").option("versionAsOf", 3).load(path)
  *   spark.read.format("graft").option("timestampAsOf", ms).load(path)
  *   // SQL: CREATE TEMPORARY VIEW t USING graft OPTIONS (path '...')
  * }}}
  *
  * Built on the STABLE V1 source API (RelationProvider +
  * PrunedFilteredScan), delegating to the SnapshotStore read paths —
  * the same trade Spark's own JDBC source makes: the relation plans a
  * DataFrame internally and hands its RDD back, so every downstream
  * feature (column pruning, codegen, AQE) applies unchanged.
  *
  * Filter pushdown: Catalyst hands the scan its equality/range
  * predicates; integral bounds on a single column become a
  * [[SnapshotStore.readWhere]] call, whose distributed
  * stats-checkpoint join SKIPS every parquet file whose recorded
  * (min,max) range for that column misses the bounds — partition-
  * pruning semantics without physical partition directories. All
  * filters are reported unhandled, so Spark re-applies them above the
  * scan: pruning is a strict file-skipping optimization and can never
  * change results (a column without stats degrades to a full scan,
  * the readWhere rule).
  *
  * Time travel: `versionAsOf` pins an exact version;
  * `timestampAsOf` (epoch millis) resolves to the latest version
  * committed at or before the instant — Delta's option names, so the
  * habit transfers. */
class GraftSnapshotSource extends RelationProvider
    with CreatableRelationProvider with StreamSinkProvider
    with StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft source requires a path: .load(path) / OPTIONS (path '...')"))

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val path = pathOf(parameters)
    // Delta CDF parity: option("readChangeFeed", "true") turns the
    // scan into the version-range CHANGELOG (insert/delete/update rows
    // with the _change column) instead of a snapshot — the standard
    // surface over SnapshotStore.readChanges. startingVersion is
    // INCLUSIVE like Delta's (that version's own commit is part of
    // the feed; startingVersion = 1 therefore begins with the first
    // commit's rows as inserts), defaulting to 1; endingVersion
    // defaults to the live head; option("key", c) selects the keyed
    // I/U/D classification.
    if (parameters.get("readChangeFeed").exists(_.equalsIgnoreCase("true"))) {
      val from = parameters.get("startingVersion").map(_.toLong).getOrElse(1L)
      val to = parameters.get("endingVersion").map(_.toLong)
        .getOrElse(SnapshotStore.latestVersion(path))
      // withCommitVersion (r17): Delta CDF's _commit_version /
      // _commit_timestamp columns — per-commit attribution instead of
      // the coalesced range delta
      GraftChangesRelation(sqlContext, path, from, to, parameters.get("key"),
        versioned = parameters.get("withCommitVersion")
          .exists(_.equalsIgnoreCase("true")))
    } else {
      val version = parameters.get("versionAsOf").map(_.toLong)
        .orElse(parameters.get("timestampAsOf").map(ts =>
          SnapshotStore.versionAsOf(path, ts.toLong)))
      GraftSnapshotRelation(sqlContext, path, version,
        parameters.get("statsKey"))
    }
  }

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
                              parameters: Map[String, String],
                              data: DataFrame): BaseRelation = {
    val path = pathOf(parameters)
    SnapshotStore.commit(data, path, mode,
      statsKey = parameters.get("statsKey")): Unit
    createRelation(sqlContext, parameters)
  }

  /** `readStream.format("graft")` (r17) — the STREAMING source half of
    * the registered surface: offsets are snapshot versions, each
    * micro-batch is the O(changed files) changelog of its version
    * range, and `option("readChangeFeed", "true")` delivers exact
    * I/U/D rows with `_change` (`key` selects keyed classification).
    * Semantics + options: [[org.apache.spark.sql.graft.GraftStreamSource]]. */
  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String])
      : (String, StructType) = {
    require(schema.isEmpty,
      "graft streaming source derives its schema from the table; " +
        "do not pass one")
    val path = pathOf(parameters)
    (shortName(),
      org.apache.spark.sql.graft.GraftStreamSource.schemaFor(
        sqlContext.sparkSession, path,
        parameters.get("readChangeFeed").exists(_.equalsIgnoreCase("true")),
        parameters.get("withCommitVersion")
          .exists(_.equalsIgnoreCase("true"))))
  }

  override def createSource(sqlContext: SQLContext,
                            metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String])
      : org.apache.spark.sql.execution.streaming.Source =
    org.apache.spark.sql.graft.GraftStreamSource.fromOptions(
      sqlContext, pathOf(parameters), parameters)

  /** `writeStream.format("graft")` — every micro-batch becomes one
    * APPEND snapshot commit through [[SnapshotStore.streamSink]],
    * whose batch-id rule skips replayed batches: exactly-once into
    * the table, the streamSink contract behind the standard sink
    * surface. */
  override def createSink(sqlContext: SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    val path = pathOf(parameters)
    // Append is the only mode whose micro-batches are disjoint row
    // sets; Update/Complete re-emit rows and would pile stale copies
    // into an append-only table (Spark's FileStreamSink rejects them
    // for the same reason)
    require(outputMode == org.apache.spark.sql.streaming.OutputMode.Append,
      s"graft sink supports Append output mode only, got $outputMode")
    new org.apache.spark.sql.execution.streaming.Sink {
      override def addBatch(batchId: Long,
                            data: org.apache.spark.sql.Dataset[Row]): Unit = {
        // the incoming frame is a STREAMING plan — `write` is illegal
        // on it, so rebase it onto its executed RDD as a batch frame
        // (distributed; rows are copied out of the unsafe buffers the
        // executed plan reuses)
        val schema = data.schema
        val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
          .createToScalaConverter(schema)
        val rowRdd = data.queryExecution.toRdd
          .map(ir => conv(ir.copy()).asInstanceOf[Row])
        val batchDf = data.sparkSession.createDataFrame(rowRdd, schema)
        SnapshotStore.streamSink(path)(batchDf, batchId)
      }
    }
  }
}

/** A snapshot table as a relation: explicitly pinned by
  * versionAsOf/timestampAsOf, otherwise resolving the HEAD at each
  * scan (see [[GraftSnapshotRelation.currentVersion]]); every single
  * scan is internally pinned to one version for its whole execution. */
case class GraftSnapshotRelation(sqlContext: SQLContext, path: String,
                                 pinned: Option[Long],
                                 statsKey: Option[String] = None)
    extends BaseRelation with PrunedFilteredScan with InsertableRelation {

  /** SQL `INSERT INTO` / `INSERT OVERWRITE` on a USING-graft view:
    * one snapshot commit, stats-tracked when the view was declared
    * with a statsKey option. */
  override def insert(data: DataFrame, overwrite: Boolean): Unit =
    SnapshotStore.commit(data, path,
      if (overwrite) SaveMode.Overwrite else SaveMode.Append,
      statsKey = statsKey): Unit

  /** versionAsOf/timestampAsOf pin; an UNPINNED relation resolves the
    * head at each SCAN — a long-lived USING-graft view (or the
    * relation returned right after an INSERT through it) must observe
    * later commits, not the head that happened to be live at view
    * creation. Each individual scan is still pinned to one version
    * for its whole execution (SnapshotStore.read's immutable-manifest
    * rule). */
  private def currentVersion: Long =
    pinned.getOrElse(SnapshotStore.latestVersion(path))

  override val schema: StructType =
    SnapshotStore.read(sqlContext.sparkSession, path,
      Some(currentVersion)).schema

  /** Integral bound extraction: fold the pushed filters into per-column
    * [lo, hi] windows; the TIGHTEST single-column window drives the
    * stats prune (readWhere takes one key — other columns' filters
    * still execute above the scan, they just don't skip files). */
  private def boundsOf(filters: Array[Filter]): Option[(String, Long, Long)] = {
    def num(v: Any): Option[Long] = v match {
      case i: java.lang.Integer => Some(i.longValue)
      case l: java.lang.Long    => Some(l.longValue)
      case s: java.lang.Short   => Some(s.longValue)
      case b: java.lang.Byte    => Some(b.longValue)
      case _                    => None
    }
    val acc = scala.collection.mutable.Map.empty[String, (Long, Long)]
    def tighten(c: String, lo: Long, hi: Long): Unit = {
      val (l0, h0) = acc.getOrElse(c, (Long.MinValue, Long.MaxValue))
      acc(c) = (math.max(l0, lo), math.min(h0, hi))
    }
    filters.foreach {
      case EqualTo(c, v)            => num(v).foreach(x => tighten(c, x, x))
      case GreaterThan(c, v)        => num(v).filter(_ < Long.MaxValue)
        .foreach(x => tighten(c, x + 1, Long.MaxValue))
      case GreaterThanOrEqual(c, v) => num(v).foreach(tighten(c, _, Long.MaxValue))
      case LessThan(c, v)           => num(v).filter(_ > Long.MinValue)
        .foreach(x => tighten(c, Long.MinValue, x - 1))
      case LessThanOrEqual(c, v)    => num(v).foreach(tighten(c, Long.MinValue, _))
      case In(c, vs) if vs.nonEmpty && vs.forall(num(_).isDefined) =>
        val xs = vs.flatMap(num); tighten(c, xs.min, xs.max)
      case _ => ()
    }
    // prefer the narrowest window — it skips the most files (BigInt:
    // hi - lo overflows Long for near-full-range windows and would
    // rank a useless window ahead of a point filter)
    acc.toSeq.sortBy { case (_, (lo, hi)) => BigInt(hi) - BigInt(lo) }
      .headOption.map { case (c, (lo, hi)) => (c, lo, hi) }
  }

  /** STRING equality pushdown (r18): a pushed `col = 'value'` on a
    * string column drives [[SnapshotStore.readWhereEq]]'s
    * lexicographic-range prune — partition elimination for tables
    * committed with `partitionBy` (each value clustered into few
    * files). Preferred over a numeric window when both exist on a
    * partition column: equality is the tighter prune. */
  private def stringEqOf(filters: Array[Filter]): Option[(String, String)] =
    filters.collectFirst {
      case EqualTo(c, v: String) if schema.fieldNames.contains(c) &&
        SnapshotStore.partitionColumns(path).contains(c) => (c, v)
    }.orElse(filters.collectFirst {
      case EqualTo(c, v: String) if schema.fieldNames.contains(c) => (c, v)
    })

  /** String WINDOW extraction (r18): fold pushed string comparisons
    * into per-column lexicographic [lo, hi] windows — the date-string
    * BETWEEN every warehouse query runs. Only columns with BOTH bounds
    * qualify (a half-open string window barely prunes); the first such
    * column drives [[SnapshotStore.readWhereBetween]]. */
  private def strBoundsOf(filters: Array[Filter])
      : Option[(String, String, String)] = {
    val lo = scala.collection.mutable.Map.empty[String, String]
    val hi = scala.collection.mutable.Map.empty[String, String]
    def raise(m: scala.collection.mutable.Map[String, String], c: String,
              v: String, takeMax: Boolean): Unit =
      m(c) = m.get(c).fold(v)(prev =>
        if ((v > prev) == takeMax) v else prev)
    filters.foreach {
      case GreaterThan(c, v: String)        => raise(lo, c, v, takeMax = true)
      case GreaterThanOrEqual(c, v: String) => raise(lo, c, v, takeMax = true)
      case LessThan(c, v: String)           => raise(hi, c, v, takeMax = false)
      case LessThanOrEqual(c, v: String)    => raise(hi, c, v, takeMax = false)
      case _ => ()
    }
    lo.keySet.intersect(hi.keySet).toSeq.sorted.headOption
      .filter(c => schema.fieldNames.contains(c) && lo(c) <= hi(c))
      .map(c => (c, lo(c), hi(c)))
  }

  override def buildScan(requiredColumns: Array[String],
                         filters: Array[Filter]): RDD[Row] = {
    val spark = sqlContext.sparkSession
    val version = currentVersion
    val base = stringEqOf(filters) match {
      case Some((key, value)) =>
        SnapshotStore.readWhereEq(spark, path, key, value, Some(version))
      case None => boundsOf(filters) match {
        case Some((key, lo, hi)) if schema.fieldNames.contains(key) =>
          SnapshotStore.readWhere(spark, path, key, lo, hi, Some(version))
        case _ => strBoundsOf(filters) match {
          case Some((key, lo, hi)) =>
            SnapshotStore.readWhereBetween(spark, path, key, lo, hi,
              Some(version))
          case None => SnapshotStore.read(spark, path, Some(version))
        }
      }
    }
    // empty projection = bare count(*): Spark wants 0-field rows
    if (requiredColumns.isEmpty) base.select().rdd
    else base.select(requiredColumns.map(col).toIndexedSeq: _*).rdd
  }
  // unhandledFilters stays the default (all of them): the scan only
  // SKIPS files, Spark re-applies every predicate above it
}

/** The table's CHANGELOG as a relation (Delta CDF's
  * `readChangeFeed` surface): delegates to
  * [[SnapshotStore.readChanges]] over a pinned version range, so the
  * scan is the manifest SET-DIFFERENCE (only files added/removed in
  * the range are read, never the whole table) and the output carries
  * the `_change` column — unkeyed insert/delete, or keyed I/U/D with
  * identical-rewrite suppression when `key` is given.
  *
  * `fromV` is INCLUSIVE (Delta's startingVersion): the diff baseline
  * is `fromV − 1`, and a feed "from the beginning" (baseline 0, or a
  * baseline already vacuumed) bootstraps with the oldest RETAINED
  * version's rows as inserts — consumeChanges' anchoring rule —
  * unioned with the changes from that anchor forward. */
case class GraftChangesRelation(sqlContext: SQLContext, path: String,
                                fromV: Long, toV: Long,
                                key: Option[String],
                                versioned: Boolean = false)
    extends BaseRelation with TableScan {

  // the version range is pinned at relation construction, so the plan
  // (manifest diff + sidecar schema reads) is built once, not per
  // schema/buildScan call; the semantics live in
  // SnapshotStore.changeFeed(+Versioned), shared with the STREAMING
  // source (r17)
  private lazy val changes: DataFrame =
    if (versioned)
      SnapshotStore.changeFeedVersioned(sqlContext.sparkSession, path,
        fromV, toV, key)
    else
      SnapshotStore.changeFeed(sqlContext.sparkSession, path, fromV, toV, key)

  override def schema: StructType = changes.schema

  override def buildScan(): RDD[Row] = changes.rdd
}
