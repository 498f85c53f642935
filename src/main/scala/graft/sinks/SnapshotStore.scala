package graft.sinks

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Versioned snapshot log over parquet — the manifest layer
  * TableWriter.compact's scaladoc points at: its directory-rename swap
  * has a two-rename crash window and destroys old data the moment the
  * swap lands, so a reader mid-scan during compaction races the
  * rename. Here data files are IMMUTABLE and every table state is a
  * numbered manifest listing its files (Delta/Iceberg's core idea,
  * single-writer variant):
  *
  * ```
  * table/
  *   data/v<N>-<uuid>/part-*.parquet   -- written once, never mutated
  *   _snapshots/v<N>.manifest          -- one data-file path per line
  *   _snapshots/_latest                -- the committed version number
  * ```
  *
  * Commit protocol: write the new files, write the manifest, then
  * PUBLISH with one atomic rename of the `_latest` pointer — readers
  * see the old version until that instant and the new one after; there
  * is no window with no live table and nothing a crash can corrupt
  * (an unpublished manifest/data dir is garbage, not damage). Readers
  * pin a version at plan time, so a scan KEEPS its snapshot while any
  * number of later versions commit — compaction becomes just another
  * commit (same rows, fewer files) and time-travel read is "give me
  * manifest N".
  *
  * Scale: the manifest holds file PATHS (thousands of lines at 100 TB,
  * driver-trivial); data moves only through distributed parquet
  * read/write. Same-host writers serialize on the same O_EXCL lock as
  * TableWriter.compact; committers that prepared against a stale
  * snapshot go through [[commitIf]]'s optimistic conditional publish
  * (append rebases, everything else aborts with
  * [[VersionConflictException]] — the Delta/Iceberg commit rule). */
object SnapshotStore {

  private def snapDir(path: String) = new File(path, "_snapshots")
  private def manifestFile(path: String, v: Long) =
    new File(snapDir(path), f"v$v%08d.manifest")
  private def latestFile(path: String) = new File(snapDir(path), "_latest")

  /** The committed version, or 0 if the table has no snapshot yet. */
  def latestVersion(path: String): Long = {
    val f = latestFile(path)
    if (f.exists()) new String(Files.readAllBytes(f.toPath),
      StandardCharsets.UTF_8).trim.toLong
    else 0L
  }

  private def manifest(path: String, v: Long): Seq[String] = {
    val f = manifestFile(path, v)
    require(f.exists(), s"snapshot v$v does not exist under $path")
    new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
      .split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
      .filterNot(_.startsWith("#")) // `#ts=` commit-time header
  }

  /** Commit wall-clock of version `v` (the manifest's `#ts=` header),
    * falling back to the manifest file's mtime for manifests written
    * before the header existed. */
  def commitTime(path: String, v: Long): Long = {
    val f = manifestFile(path, v)
    require(f.exists(), s"snapshot v$v does not exist under $path")
    new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
      .split("\n").find(_.startsWith("#ts="))
      .map(_.stripPrefix("#ts=").trim.toLong)
      .getOrElse(f.lastModified())
  }

  /** Retained versions, oldest first (vacuumed versions are gone). */
  def versions(path: String): Seq[Long] =
    Option(snapDir(path).listFiles()).toSeq.flatten
      .map(_.getName).filter(_.matches("v\\d{8}\\.manifest"))
      .map(_.stripPrefix("v").stripSuffix(".manifest").toLong)
      .filter(_ <= latestVersion(path)) // an unpublished manifest is not history
      .sorted

  /** Table history as data: one row per retained version —
    * (version, commit_ts millis, n_files, batch_id or null). Driver
    * metadata only (manifest-count rows), the DESCRIBE HISTORY shape. */
  def history(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    versions(path).map { v =>
      val b = batchFile(path, v)
      (v, commitTime(path, v), manifest(path, v).size,
        if (b.exists())
          Some(new String(Files.readAllBytes(b.toPath),
            StandardCharsets.UTF_8).trim.toLong)
        else None)
    }.toDF("version", "commit_ts", "n_files", "batch_id")
  }

  /** TIMESTAMP time travel: the latest version committed at or before
    * `tsMillis` (Delta's `timestampAsOf`). Commit times are strictly
    * orderable here (single-host writer lock serializes publishes);
    * across hosts they inherit wall-clock skew — version pins are the
    * exact form, timestamp pins the convenient one. */
  def readAsOf(spark: SparkSession, path: String, tsMillis: Long): DataFrame = {
    val vs = versions(path).filter(commitTime(path, _) <= tsMillis)
    require(vs.nonEmpty,
      s"no snapshot of $path existed at or before $tsMillis")
    read(spark, path, Some(vs.max))
  }

  /** Read a snapshot: the latest committed version by default, or an
    * explicit `version` for time travel. The returned frame is pinned
    * to that version's files — later commits and compactions never
    * touch them, so the scan is consistent however long it runs.
    * `mergeSchema`: appends may evolve the schema between commits, and
    * parquet's default schema inference samples ONE footer — a table
    * whose later files gained a column would read back with whichever
    * schema the sample had. Merging unions the file schemas (older
    * files null-fill the added columns, the Delta/Iceberg read
    * semantics); the footer-merge cost is per-FILE, driver-side, and
    * irrelevant next to the scan. */
  def read(spark: SparkSession, path: String,
           version: Option[Long] = None): DataFrame = {
    val v = version.getOrElse(latestVersion(path))
    require(v > 0, s"no committed snapshot under $path")
    spark.read.option("mergeSchema", "true").parquet(manifest(path, v): _*)
  }

  /** Scan PLANNING with the stats sidecar (the Iceberg/Delta
    * manifest-prune read): rows of the snapshot whose tracked stats
    * column falls in [lo, hi], reading ONLY the files whose recorded
    * (min, max) range overlaps the interval — the same sidecar
    * [[mergeCommit]]/[[deleteCommit]] prune their rewrites with, now
    * applied to the read path. File pruning happens at PLAN time from
    * the driver-resident sidecar (file-count lines, trivial at 100 TB
    * where parquet row-group pushdown alone still opens every file's
    * footer); the residual row filter stays in the scan, pushed to the
    * surviving files. Files without a stats row — e.g. written by a
    * commit that predates stats tracking — are conservatively kept. A
    * version with NO sidecar degrades to a full read + filter, never a
    * wrong answer. */
  def readWhere(spark: SparkSession, path: String, key: String,
                lo: Long, hi: Long, version: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions.col
    val v = version.getOrElse(latestVersion(path))
    require(v > 0, s"no committed snapshot under $path")
    val files = manifest(path, v)
    // prune when the sidecar tracks THIS column — primary or any
    // extra (the compactZOrdered multi-dim case); a sidecar over only
    // other columns prunes nothing but still filters
    val ranges: Map[String, (Long, Long)] = statsAll(path, v).collect {
      case ((c, f), r) if c == key => f -> r
    }
    val kept = files.filter(f =>
      ranges.get(f).forall { case (flo, fhi) => fhi >= lo && flo <= hi })
    // the everything-pruned branch derives its (empty) frame from the
    // SAME merged schema as the kept branch — a single-file sample
    // could miss an evolved column (inconsistent schema for the same
    // logical query) or even fail to resolve col(key).
    val pruned =
      if (kept.nonEmpty)
        spark.read.option("mergeSchema", "true").parquet(kept: _*)
      else
        spark.read.option("mergeSchema", "true").parquet(files: _*).limit(0)
    pruned.filter(col(key) >= lo && col(key) <= hi)
  }

  /** Write `df` as the table's next version. `mode=Overwrite` replaces
    * the table contents; `mode=Append` carries the previous manifest's
    * files forward and adds the new ones (an append commits in O(new
    * data) — old files are never rewritten). Returns the published
    * version number. */
  def commit(df: DataFrame, path: String,
             mode: SaveMode = SaveMode.Overwrite,
             batchId: Option[Long] = None,
             statsKey: Option[String] = None): Long =
    withLock(path) {
      val prev = latestVersion(path)
      val carried = mode match {
        case SaveMode.Append if prev > 0 => manifest(path, prev)
        case _ => Nil
      }
      commitLocked(df, path, carried, batchId, statsKey)
    }

  /** A concurrent commit advanced the table past the version this
    * writer prepared against, and the commit cannot be auto-rebased
    * (non-append semantics). Re-read the new snapshot and retry. */
  final class VersionConflictException(msg: String)
    extends java.io.IOException(msg)

  /** Optimistic CONDITIONAL publish — the Delta/Iceberg multi-writer
    * commit rule (r15), for committers that prepared work against a
    * snapshot without holding the writer lock the whole time: pass
    * the version you read (`expectedVersion`); under the lock the
    * live version is re-read and
    *
    *   - unchanged → the commit publishes normally;
    *   - advanced + `mode=Append` → the commit REBASES: fresh data
    *     dirs are UUID-named so two appends are file-disjoint by
    *     construction — the loser simply carries the WINNER's manifest
    *     instead of its stale one, and both writers' rows land;
    *   - advanced + any other mode → [[VersionConflictException]]:
    *     the prepared rows may depend on rows the winner changed, so
    *     auto-merge would be a lost update — the caller re-reads and
    *     retries (the mergeCommit/deleteCommit paths already serialize
    *     under the lock and never need this).
    *
    * A crash between manifest write and pointer publish heals exactly
    * as for [[commit]] (withLock heals first). Returns the published
    * version. */
  def commitIf(df: DataFrame, path: String, expectedVersion: Long,
               mode: SaveMode = SaveMode.Append,
               batchId: Option[Long] = None,
               statsKey: Option[String] = None): Long =
    withLock(path) {
      val cur = latestVersion(path)
      if (cur != expectedVersion && mode != SaveMode.Append)
        throw new VersionConflictException(
          s"snapshot commit: $path advanced to v$cur (prepared against " +
            s"v$expectedVersion) — re-read and retry")
      val carried = mode match {
        case SaveMode.Append if cur > 0 => manifest(path, cur) // rebase
        case _ => Nil
      }
      commitLocked(df, path, carried, batchId, statsKey)
    }

  /** How long a writer WAITS for the lock before giving up. Waiting
    * (rather than failing immediately) is what lets the documented
    * stream-ingest + periodic-compaction pairing coexist: a micro-batch
    * landing while compact holds the lock parks briefly instead of
    * failing the streaming query. A lock held past the timeout is
    * assumed crashed/abandoned and surfaces as the explicit error. */
  @volatile var lockWaitMs: Long = 60000L

  private def withLock[A](path: String)(body: => A): A = {
    val lock = new File(path.stripSuffix("/") + ".snapshot-lock")
    new File(path).mkdirs()
    val deadline = System.nanoTime() + lockWaitMs * 1000000L
    var acquired = lock.createNewFile()
    while (!acquired && System.nanoTime() < deadline) {
      Thread.sleep(100)
      acquired = lock.createNewFile()
    }
    if (!acquired)
      throw new java.io.IOException(
        s"snapshot commit: ${lock.getName} held for over ${lockWaitMs} ms — concurrent writer (or crashed one; remove the lock after inspection)")
    try { healLocked(path); body } finally { lock.delete(): Unit }
  }

  /** Write `df` as fresh files, carry `carried` forward, publish. When
    * `statsKey` is set, per-file (min, max) ranges of that column are
    * recorded in the version's stats sidecar (one extra skinny agg
    * over the fresh files, grouped by input_file_name) — the footer-
    * stats layer [[mergeCommit]] prunes with. */
  private def commitLocked(df: DataFrame, path: String,
                           carried: Seq[String], batchId: Option[Long],
                           statsKey: Option[String],
                           extraStatsCols: Seq[String] = Nil): Long = {
    val prev = latestVersion(path)
    val v = prev + 1
    val dataDir = new File(new File(path, "data"),
      f"v$v%08d-${java.util.UUID.randomUUID().toString.take(8)}")
    df.write.mode(SaveMode.ErrorIfExists).parquet(dataDir.getPath)
    val fresh = Option(dataDir.listFiles()).toSeq.flatten
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(_.getPath).sorted
    // a carried-only commit (fresh empty) is legal — deleteCommit's
    // "every touched row deleted" case; a fully-empty table is not
    require(fresh.nonEmpty || carried.nonEmpty,
      s"snapshot commit: empty write for $path")
    statsKey.foreach { key =>
      val cols = (key +: extraStatsCols).distinct
      val spark = df.sparkSession
      // one skinny agg over the fresh files for ALL tracked columns
      val freshStats: Map[(String, String), (Long, Long)] =
        if (fresh.isEmpty) Map.empty
        else {
          import org.apache.spark.sql.functions.{input_file_name, min, max}
          spark.read.parquet(fresh: _*)
            .groupBy(input_file_name().as("f"))
            .agg(min(cols.head).cast("long").as(s"lo_0"),
              (max(cols.head).cast("long").as(s"hi_0") +:
                cols.tail.zipWithIndex.flatMap { case (c, i) =>
                  Seq(min(c).cast("long").as(s"lo_${i + 1}"),
                    max(c).cast("long").as(s"hi_${i + 1}"))
                }): _*)
            .collect()
            .flatMap { r =>
              val f = normalizePath(r.getString(0))
              cols.zipWithIndex.map { case (c, i) =>
                (c, f) -> (r.getAs[Long](s"lo_$i"), r.getAs[Long](s"hi_$i"))
              }
            }.toMap
        }
      val carriedStats: Map[(String, String), (Long, Long)] =
        if (prev > 0) statsAll(path, prev) else Map.empty
      val all = for {
        c <- cols
        f <- carried ++ fresh
        r <- freshStats.get((c, f)).orElse(carriedStats.get((c, f)))
      } yield (c, f, r)
      // the sidecar records WHICH columns it tracks (#key= primary for
      // back-compat, #cols= the full list when more than one), so
      // maintenance commits can keep recording instead of silently
      // dropping the pruning layer. Single-column sidecars keep the
      // legacy 3-field line format; multi-column ones tag each line.
      val body =
        if (cols.size == 1)
          all.map { case (_, f, (lo, hi)) => s"$f\t$lo\t$hi" }
        else
          all.map { case (c, f, (lo, hi)) => s"$f\t$c\t$lo\t$hi" }
      atomicWrite(statsFile(path, v),
        s"#key=$key\n" +
          (if (cols.size > 1) s"#cols=${cols.mkString(",")}\n" else "") +
          body.mkString("\n") + "\n")
    }
    publish(path, v, carried ++ fresh, batchId)
    v
  }

  private def statsFile(path: String, v: Long) =
    new File(snapDir(path), f"v$v%08d.stats")

  /** input_file_name() yields a file: URI; manifests hold plain paths. */
  private def normalizePath(p: String): String =
    if (p.startsWith("file:")) new java.net.URI(p).getPath else p

  /** Per-file (min, max) ranges of the PRIMARY stats column, empty if
    * the version has no stats sidecar (then nothing can be pruned). */
  private def stats(path: String, v: Long): Map[String, (Long, Long)] =
    statsKeyOf(path, v) match {
      case None => Map.empty
      case Some(k) => statsAll(path, v).collect {
        case ((c, f), r) if c == k => f -> r
      }
    }

  /** ALL recorded per-file ranges, keyed (column, file). Single-column
    * (legacy 3-field) sidecars attribute their lines to the `#key=`
    * column; multi-column sidecars tag each line. */
  private def statsAll(path: String, v: Long)
      : Map[(String, String), (Long, Long)] = {
    val f = statsFile(path, v)
    if (!f.exists()) Map.empty
    else {
      val lines = new String(Files.readAllBytes(f.toPath),
        StandardCharsets.UTF_8).split("\n").toSeq.map(_.trim)
        .filter(_.nonEmpty)
      val primary = lines.find(_.startsWith("#key="))
        .map(_.stripPrefix("#key=").trim).getOrElse("")
      lines.filterNot(_.startsWith("#")).map { l =>
        val a = l.split("\t")
        if (a.length == 3) (primary, a(0)) -> (a(1).toLong, a(2).toLong)
        else (a(1), a(0)) -> (a(2).toLong, a(3).toLong)
      }.toMap
    }
  }

  /** The column a version's stats sidecar tracks (its `#key=` header),
    * if any — lets maintenance commits preserve the pruning layer. */
  private def statsKeyOf(path: String, v: Long): Option[String] = {
    val f = statsFile(path, v)
    if (!f.exists()) None
    else new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
      .split("\n").find(_.startsWith("#key="))
      .map(_.stripPrefix("#key=").trim).filter(_.nonEmpty)
  }

  /** Changelog (CDC) read: the row-level DELTA between two committed
    * versions, read in O(changed files) — never O(table). Data files
    * are immutable, so the manifest SET DIFFERENCE is exact file-level
    * change pruning: files carried between the versions cannot hold
    * changed rows and are never opened (the same sidecar discipline
    * that makes [[mergeCommit]] O(touched data) makes this read
    * O(touched data) — a point-key merge at 100 TB yields a CDC read
    * of one removed + one added file).
    *
    * Keyless: every row of an added file is an `insert`, every row of
    * a removed file a `delete` — exact for any table, but a compaction
    * (same rows, new files) shows up as delete+insert pairs.
    * With `key` (the [[mergeCommit]] key-unique contract): removed and
    * added rows are full-outer-joined on the key and classified
    * insert / update / delete, with payload-identical rewrites — a
    * compaction, or a merge's carried survivors — SUPPRESSED, so a
    * pure compaction produces an EMPTY changelog. Output: the table's
    * columns (new-side payload for insert/update, old-side for
    * delete) plus `_change`. */
  /** Rewrite `c` (of type `dt`) into a form whose to_json serialization
    * is canonical: every MapType at ANY nesting depth becomes its entry
    * array sorted by key (sort_array over array<struct<key,value>>
    * orders by the first field), so two equal maps built in different
    * insertion orders hash identically. Null maps/structs stay null — a
    * null map must not collide with an empty one. Types that carry no
    * map anywhere return `c` unchanged: the common scalar/struct/array
    * table pays zero plan cost. */
  private def canonicalize(c: org.apache.spark.sql.Column,
                           dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    def hasMap(t: DataType): Boolean = t match {
      case _: MapType => true
      case ArrayType(et, _) => hasMap(et)
      case StructType(fs) => fs.exists(f => hasMap(f.dataType))
      case _ => false
    }
    def go(c0: org.apache.spark.sql.Column, t: DataType)
        : org.apache.spark.sql.Column = t match {
      case MapType(kt, vt, _) =>
        sort_array(transform(map_entries(c0), e =>
          struct(go(e.getField("key"), kt).as("key"),
            go(e.getField("value"), vt).as("value"))))
      case ArrayType(et, _) if hasMap(et) =>
        transform(c0, x => go(x, et))
      case st: StructType if hasMap(st) =>
        when(c0.isNull, lit(null)).otherwise(struct(st.fields.map(f =>
          go(c0.getField(f.name), f.dataType).as(f.name)).toSeq: _*))
      case _ => c0
    }
    if (hasMap(dt)) go(c, dt) else c
  }

  def readChanges(spark: SparkSession, path: String, fromV: Long, toV: Long,
                  key: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.functions._
    require(fromV >= 1 && toV >= fromV,
      s"readChanges: need 1 <= fromV <= toV, got $fromV..$toV")
    val before = manifest(path, fromV)
    val after = manifest(path, toV)
    val added = after.filterNot(before.toSet).sorted
    val removed = before.filterNot(after.toSet).sorted
    // mergeSchema on BOTH sides: a CDC range spanning several commits
    // reads schema-heterogeneous file sets, and one-footer inference
    // would nondeterministically drop an evolved column from the delta
    // (and from `common`, flipping update/suppressed classification).
    def readFiles(fs: Seq[String]): DataFrame =
      if (fs.nonEmpty)
        spark.read.option("mergeSchema", "true").parquet(fs: _*)
      else spark.read.option("mergeSchema", "true")
        .parquet(after.headOption.getOrElse(before.head)).limit(0)
    val ins = readFiles(added)
    val del = readFiles(removed)
    require(!ins.columns.contains("_change") && !del.columns.contains("_change"),
      "readChanges: the table already has a _change column (reserved)")
    key match {
      case None =>
        // allowMissingColumns: versions may differ in schema (columns
        // added between commits) — the missing side null-fills, the
        // Delta CDF convention.
        ins.withColumn("_change", lit("insert"))
          .unionByName(del.withColumn("_change", lit("delete")),
            allowMissingColumns = true)
      case Some(k) =>
        // Schema evolution (r15): the keyed variant hashes only the
        // COMMON payload columns — a column present on one side only
        // cannot distinguish an update from an identical rewrite, so
        // it is excluded from change detection and NULL-filled on the
        // side that lacks it (Delta CDF's union semantics). A rewrite
        // that differs ONLY in a fresh column's values is therefore
        // suppressed — by design: the old rows never carried the
        // column, there is nothing to diff against.
        // Payload equality is sha2(to_json(...)) over a CANONICALIZED
        // struct: map columns serialize in insertion order (two equal
        // maps built in different orders produce different JSON), so
        // [[canonicalize]] rewrites every MapType — at any nesting
        // depth — to its entry array sorted by key before hashing.
        // Scalars/structs/arrays pass through (parquet order is the
        // row's order, already deterministic).
        val insCols = ins.columns.toSeq
        val delCols = del.columns.toSeq
        val cols = insCols ++ delCols.filterNot(insCols.contains)
        require(insCols.contains(k) && delCols.contains(k),
          s"readChanges: key $k missing on one side " +
            s"(new: ${insCols.mkString(",")}; old: ${delCols.mkString(",")})")
        val common = insCols.filter(delCols.contains).filterNot(_ == k)
        def side(df: DataFrame, tag: String) = {
          val have = df.columns.toSet
          val byName = df.schema.fields.map(f => f.name -> f.dataType).toMap
          df.select(
            col(k).as("_k"),
            struct(cols.map(c =>
              (if (have(c)) col(c) else lit(null)).as(c)): _*).as(s"_row_$tag"),
            sha2(to_json(struct(common.map(c =>
              canonicalize(col(c), byName(c)).as(c)): _*)), 256).as(s"_h_$tag"))
        }
        side(del, "o").join(side(ins, "n"), Seq("_k"), "full")
          .withColumn("_change",
            when(col("_row_o").isNull, "insert")
              .when(col("_row_n").isNull, "delete")
              .when(col("_h_o") =!= col("_h_n"), "update"))
          .filter(col("_change").isNotNull) // identical rewrite → no change
          // whole-struct nullness picks the side (a field-level
          // coalesce would leak old values into null NEW fields)
          .select(cols.map(c =>
            when(col("_row_n").isNotNull, col(s"_row_n.$c"))
              .otherwise(col(s"_row_o.$c")).as(c)) :+
            col("_change"): _*)
    }
  }

  // ——— incremental consumers: checkpointed changelog reads ———

  private def consumerFile(path: String, id: String) = {
    require(id.matches("[A-Za-z0-9_-]+"), s"consumer id '$id'")
    new File(new File(path, "_consumers"), id)
  }

  /** The last version consumer `id` acknowledged, or 0 (nothing). */
  def consumerVersion(path: String, id: String): Long = {
    val f = consumerFile(path, id)
    if (f.exists()) new String(Files.readAllBytes(f.toPath),
      StandardCharsets.UTF_8).trim.toLong
    else 0L
  }

  /** Incremental-ETL read: everything that changed since consumer `id`
    * last acknowledged, as (changes, toVersion). First call returns
    * the WHOLE live table as inserts (from version 0 there is no
    * "before"). The consumer processes the frame, then calls
    * [[ackChanges]] with the returned version — ack-after-process
    * gives at-least-once delivery (a crash between the two re-delivers
    * the same delta; an idempotent downstream — e.g. a keyed upsert —
    * makes it effectively exactly-once, the streamSink batch-id
    * pattern at the consumer side). Returns changes=None when the
    * consumer is already at the live version.
    *
    * Retention contract: the delta needs BOTH endpoint manifests, so
    * [[vacuum]]'s `keepVersions` must exceed the slowest consumer's
    * lag — a consumer behind the retention window fails fast on the
    * missing manifest (Delta semantics) and must re-bootstrap. */
  def consumeChanges(spark: SparkSession, path: String, id: String,
                     key: Option[String] = None)
      : (Option[DataFrame], Long) = {
    val from = consumerVersion(path, id)
    val to = latestVersion(path)
    if (to <= from) (None, from)
    else if (from == 0L) {
      val boot = read(spark, path, Some(to))
      require(!boot.columns.contains("_change"),
        "consumeChanges: the table already has a _change column (reserved)")
      (Some(boot
        .withColumn("_change", org.apache.spark.sql.functions.lit("insert"))), to)
    } else (Some(readChanges(spark, path, from, to, key)), to)
  }

  /** Record consumer `id` as caught up through `version` (atomic
    * pointer write; monotone — an ack below the current pointer is
    * ignored, so replays can ack blindly). */
  def ackChanges(path: String, id: String, version: Long): Unit = {
    if (version > consumerVersion(path, id))
      atomicWrite(consumerFile(path, id), version.toString)
  }

  /** Delta-style MERGE as a snapshot commit (upsert-by-key): rows of
    * `df` replace same-key rows of the live version. File-level stats
    * pruning makes this O(touched data), not O(table): only files
    * whose recorded [min, max] key range overlaps the batch's key
    * range are read and rewritten (minus replaced keys); every
    * disjoint file is CARRIED by reference — at 100 TB with
    * range-partitioned commits a point-key batch rewrites one file.
    * Files without stats (or a table without sidecars) degrade to
    * "touched", never to wrong results. Returns the new version. */
  def mergeCommit(spark: SparkSession, path: String, df: DataFrame,
                  key: String): Long = withLock(path) {
    import org.apache.spark.sql.functions.col
    val v = latestVersion(path)
    require(v > 0, s"no committed snapshot under $path")
    val files = manifest(path, v)
    // per-KEY ranges, like readWhere: the sidecar's primary column may
    // differ from the merge key (e.g. a table stats-tracked on `ts`
    // merged by `id`) — pruning with the wrong column's ranges would
    // classify files as untouched whose matching-key rows then survive
    // the rewrite (a silent lost update). A file with no range for
    // THIS key — including a sidecar tracking only other columns —
    // degrades to "touched", never to a wrong answer.
    val st: Map[String, (Long, Long)] = statsAll(path, v).collect {
      case ((c, f), r) if c == key => f -> r
    }
    val bounds = df.agg(
      org.apache.spark.sql.functions.min(key).cast("long"),
      org.apache.spark.sql.functions.max(key).cast("long")).head()
    require(!bounds.isNullAt(0), s"mergeCommit: empty batch for $path")
    val (bLo, bHi) = (bounds.getLong(0), bounds.getLong(1))
    val (untouched, touched) = files.partition { f =>
      st.get(f).exists { case (lo, hi) => hi < bLo || lo > bHi }
    }
    // mergeSchema: touched files may span commits with different
    // schemas (appends add columns); plain parquet inference samples
    // ONE footer and could drop an evolved column from the rewrite.
    val survivors =
      if (touched.isEmpty) df
      else spark.read.option("mergeSchema", "true").parquet(touched: _*)
        .join(df.select(col(key)).distinct(), Seq(key), "left_anti")
        .unionByName(df, allowMissingColumns = true)
    // preserve the pruning layer under whatever column the table
    // already tracks (the merge key may be a different column — same
    // discipline as deleteCommit); a fresh table starts tracking `key`
    commitLocked(survivors, path, untouched, None,
      statsKeyOf(path, v).orElse(Some(key)))
  }

  /** Row-level DELETE as a snapshot commit (r15) — the retention /
    * takedown (GDPR) operation every corpus store hits. Same stats
    * pruning as [[mergeCommit]]: only files whose recorded [min, max]
    * key range overlaps the delete-key range are read and rewritten
    * (minus the deleted keys); every disjoint file is CARRIED by
    * reference, so a point-key takedown at 100 TB rewrites one file.
    * Files without stats degrade to "touched" (full rewrite), never to
    * wrong results. Pinned readers keep their snapshot (the deleted
    * rows' files are immutable until [[vacuum]] reclaims them); a
    * keyed [[readChanges]] across the commit emits the deletions as
    * `_change='delete'` rows and suppresses the carried survivors.
    * Keys absent from the table are a no-op. Deleting EVERY row of
    * the table is rejected (drop the table instead). Returns the new
    * version (== the old one if no file was touched). */
  def deleteCommit(spark: SparkSession, path: String, keys: DataFrame,
                   key: String): Long = withLock(path) {
    import org.apache.spark.sql.functions.col
    val v = latestVersion(path)
    require(v > 0, s"no committed snapshot under $path")
    val files = manifest(path, v)
    // per-KEY ranges (not the sidecar's primary column) — a takedown
    // by `id` on a table stats-tracked on `ts` must not skip files
    // whose ts-range happens to be disjoint from the id-bounds; files
    // with no range for THIS key degrade to "touched".
    val st: Map[String, (Long, Long)] = statsAll(path, v).collect {
      case ((c, f), r) if c == key => f -> r
    }
    val ks = keys.select(col(key)).distinct()
    val bounds = ks.agg(
      org.apache.spark.sql.functions.min(key).cast("long"),
      org.apache.spark.sql.functions.max(key).cast("long")).head()
    require(!bounds.isNullAt(0), s"deleteCommit: empty key set for $path")
    val (bLo, bHi) = (bounds.getLong(0), bounds.getLong(1))
    val (untouched, touched) = files.partition { f =>
      st.get(f).exists { case (lo, hi) => hi < bLo || lo > bHi }
    }
    if (touched.isEmpty) v // every file disjoint from the key range
    else {
      // mergeSchema for the same reason as mergeCommit: touched files
      // may carry an evolved column a one-footer sample would drop.
      val survivors = spark.read.option("mergeSchema", "true")
        .parquet(touched: _*)
        .join(ks, Seq(key), "left_anti")
      // preserve the pruning layer under whatever key the table
      // already tracks (deletes may use a different column)
      commitLocked(survivors, path, untouched, None,
        statsKeyOf(path, v).orElse(Some(key)))
    }
  }

  // ——— streaming integration: exactly-once foreachBatch commits ———

  private def batchFile(path: String, v: Long) =
    new File(snapDir(path), f"v$v%08d.batch")

  /** Complete or roll back a crashed publish. The publish sequence is
    * data → manifest → batch sidecar → pointer (each file landing via
    * atomic rename), so a crash leaves at most version latest+1
    * artifacts, and the SIDECAR decides the direction:
    *   - sidecar present: replay detection is already observable, so
    *     the data MUST become visible — roll FORWARD (finish the
    *     pointer swap);
    *   - sidecar absent: nothing about this commit is observable —
    *     roll BACK (drop the manifest; the orphaned data dir is
    *     garbage for vacuum, and the caller/stream simply redoes the
    *     commit).
    * Either way the exactly-once invariant holds: a batch id is
    * recorded iff its rows are (or will be, after this heal) visible.
    * Idempotent; takes the writer lock. */
  def recoverCommit(path: String): Unit = {
    if (!snapDir(path).exists()) return
    withLock(path)(()) // withLock heals before the (empty) body
  }

  private def healLocked(path: String): Unit = {
    val v = latestVersion(path) + 1
    val mf = manifestFile(path, v)
    if (mf.exists()) {
      if (batchFile(path, v).exists()) publishPointer(path, v) // roll forward
      else { mf.delete(): Unit }                               // roll back
    }
  }

  /** Highest micro-batch id ever committed into this table, or −1.
    * Batch ids are recorded in per-version sidecar files; together
    * with [[recoverCommit]]'s heal rule, a batch id is observable here
    * iff its rows are visible — the replay-detection invariant. */
  def lastStreamBatch(path: String): Long = {
    val d = snapDir(path)
    Option(d.listFiles()).toSeq.flatten
      .filter(_.getName.endsWith(".batch"))
      .map(f => new String(Files.readAllBytes(f.toPath),
        StandardCharsets.UTF_8).trim.toLong)
      .foldLeft(-1L)(math.max)
  }

  /** An exactly-once streaming sink: use as
    * `stream.writeStream.foreachBatch(SnapshotStore.streamSink(path) _)`.
    * Each micro-batch becomes an APPEND snapshot commit; on checkpoint
    * recovery Structured Streaming re-delivers the last possibly-
    * uncommitted batch, and the recorded batch id makes the replay a
    * no-op — the table sees every micro-batch exactly once even
    * though the delivery contract is at-least-once.
    *
    * Lock contention (r15): a compaction or merge holding the writer
    * lock past `lockWaitMs` must DELAY the stream, not kill it — a
    * lock-timeout here retries up to `lockRetries` more waits (total
    * patience (1+lockRetries)·lockWaitMs) before surfacing the error
    * and failing the streaming query. */
  def streamSink(path: String, lockRetries: Int = 4)
                (df: DataFrame, batchId: Long): Unit = {
    var attempt = 0
    var done = false
    while (!done) {
      try {
        recoverCommit(path) // a crashed publish must heal BEFORE the skip check
        if (batchId > lastStreamBatch(path)) {
          commit(df, path, SaveMode.Append, batchId = Some(batchId)): Unit
        }
        done = true
      } catch {
        case e: java.io.IOException
            if attempt < lockRetries &&
              e.getMessage != null && e.getMessage.contains("held for over") =>
          attempt += 1 // long maintenance window: park another round
      }
    }
  }

  /** Every publication file lands via write-to-tmp + atomic rename, so
    * existence implies completeness (the heal rule depends on it). */
  private def atomicWrite(target: File, content: String): Unit = {
    target.getParentFile.mkdirs()
    val tmp = new File(target.getParentFile, target.getName + ".tmp")
    Files.write(tmp.toPath, content.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp.toPath, target.toPath,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  private def publishPointer(path: String, v: Long): Unit =
    atomicWrite(latestFile(path), v.toString)

  /** Manifest (+ batch sidecar) + atomic pointer swap — the pointer
    * rename is the single publication instant. The manifest's `#ts=`
    * header records the commit wall-clock (epoch millis) INSIDE the
    * atomically-written manifest itself — the timestamp time travel
    * ([[readAsOf]]) and [[history]] anchor; a sidecar would add a
    * second crash window, a comment line cannot. */
  private def publish(path: String, v: Long, files: Seq[String],
                      batchId: Option[Long]): Unit = {
    snapDir(path).mkdirs()
    atomicWrite(manifestFile(path, v),
      s"#ts=${System.currentTimeMillis()}\n" + files.mkString("\n") + "\n")
    batchId.foreach(b => atomicWrite(batchFile(path, v), b.toString))
    publishPointer(path, v)
  }

  /** Compaction as a COMMIT: read the latest snapshot, rewrite into
    * ~targetBytes files (sorted within files when `sortCols` given, so
    * min/max stats stay selective), publish as the next version. The
    * previous version's files are untouched — a reader that pinned
    * version N mid-scan finishes against N while N+1 serves new
    * plans; TableWriter.compact's crash window and reader race do not
    * exist here. The whole read→rewrite→publish runs INSIDE the writer
    * lock: resolving the source manifest outside it would let a commit
    * (e.g. a streamSink append) land between the read and the publish
    * and be silently overwritten by the stale snapshot — a lost update
    * whose batch-id sidecar would still claim the rows were ingested.
    * Holding the lock for the rewrite is the single-writer contract,
    * not a new cost. Returns the new version. */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L << 20,
              sortCols: Seq[String] = Nil,
              statsKey: Option[String] = None): Long = withLock(path) {
    val v = latestVersion(path)
    require(v > 0, s"no committed snapshot under $path")
    val files = manifest(path, v)
    val bytes = files.map(f => new File(f).length()).sum
    val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    // mergeSchema is load-bearing here: compaction REPLACES the table
    // (carried=Nil), so a one-footer schema sample of an evolved table
    // would rewrite it without the later-added column and vacuum would
    // then destroy the only files that still had it.
    val df = spark.read.option("mergeSchema", "true").parquet(files: _*)
    // RANGE partition under sortCols: the rewritten files get DISJOINT
    // key ranges, which is what makes the re-recorded stats sidecar
    // selective (round-robin + local sort would leave every file
    // spanning the whole key range — stats present but useless)
    val out = if (sortCols.nonEmpty)
      df.repartitionByRange(nFiles,
          sortCols.map(org.apache.spark.sql.functions.col): _*)
        .sortWithinPartitions(
          sortCols.map(org.apache.spark.sql.functions.col): _*)
    else df.coalesce(nFiles)
    // re-record stats for the rewritten files: compaction would
    // otherwise DROP the sidecar and silently degrade every later
    // mergeCommit to a full-table rewrite. Default to the sidecar key
    // the table already tracks: sortCols.head under a sorted compact
    // (sorting by the merge key is also what keeps the ranges
    // selective), else the previous sidecar's recorded #key= column —
    // a coalesce compact then keeps stats PRESENT and CORRECT (each
    // file may span the key range: unpruned, never wrong).
    val key = statsKey.orElse(
      if (stats(path, v).nonEmpty)
        sortCols.headOption.orElse(statsKeyOf(path, v))
      else None)
    require(stats(path, v).isEmpty || key.nonEmpty,
      s"compact: $path tracks pruning stats but no stats key is " +
        "resolvable — pass statsKey (or sortCols) so compaction does " +
        "not silently drop the pruning layer")
    commitLocked(out, path, Nil, None, key)
  }

  /** Z-ORDER compaction (Delta's OPTIMIZE ZORDER BY as a snapshot
    * commit): rewrite the live version clustered by the Morton code of
    * `dims`, so every output file covers a compact hyper-rectangle and
    * min/max footer stats prune range filters on ANY of the dims —
    * where [[compact]]'s single-key range sort prunes only its leading
    * key. Same commit discipline: readers pinned at the old version
    * are untouched, the rewrite is just the next version, the stats
    * sidecar is re-recorded on `statsKey` (default: the first dim) so
    * mergeCommit keeps pruning. One skinny quantile pass (ZOrder's
    * per-dim buckets) + one range shuffle on `_z`. */
  def compactZOrdered(spark: SparkSession, path: String,
                      dims: Seq[String],
                      targetBytes: Long = 128L << 20,
                      statsKey: Option[String] = None): Long =
    withLock(path) {
      import org.apache.spark.sql.functions.col
      require(dims.nonEmpty, "compactZOrdered: need at least one dim")
      val v = latestVersion(path)
      require(v > 0, s"no committed snapshot under $path")
      val files = manifest(path, v)
      val bytes = files.map(f => new File(f).length()).sum
      val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
      // mergeSchema: same full-replacement hazard as [[compact]].
      val df = spark.read.option("mergeSchema", "true").parquet(files: _*)
      val out = graft.functions.ZOrder.withZ(df, dims)
        .repartitionByRange(nFiles, col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
      // record per-file ranges for EVERY dim: z-ordered files cover
      // compact hyper-rectangles, so the multi-column sidecar makes
      // readWhere file-prune on ANY dim, not just the primary
      val key = statsKey.orElse(dims.headOption)
      commitLocked(out, path, Nil, None, key,
        extraStatsCols = dims.filterNot(key.contains))
    }

  /** Drop data files referenced by NO manifest in the retained window
    * (the newest `keepVersions` manifests). Old manifests outside the
    * window are deleted too: time travel is bounded by retention,
    * exactly like Delta's VACUUM. Never touches the live version.
    * Runs under the writer lock: an in-flight commit's fresh data dir
    * is referenced by no manifest until its pointer publishes, so an
    * unlocked vacuum could destroy it mid-commit and leave the new
    * manifest pointing at deleted files. Inside the lock (which heals
    * any crashed publish first) every data dir above latestVersion is
    * definitively rolled-back garbage and safe to drop. */
  def vacuum(path: String, keepVersions: Int = 2): Long = withLock(path) {
    val v = latestVersion(path)
    if (v == 0) 0L else vacuumLocked(path, v, keepVersions)
  }

  private def vacuumLocked(path: String, v: Long, keepVersions: Int): Long = {
    val keepFrom = math.max(1L, v - keepVersions + 1)
    val live: Set[String] =
      (keepFrom to v).flatMap(ver => manifest(path, ver)).toSet
    var dropped = 0L
    // delete expired manifests + their stats sidecars
    (1L until keepFrom).foreach { ver =>
      val f = manifestFile(path, ver)
      if (f.exists()) { f.delete(); () }
      val st = statsFile(path, ver)
      if (st.exists()) { st.delete(); () }
      // keep .batch sidecars even when expired: replay detection must
      // survive retention, or a vacuumed table re-ingests an old batch
    }
    // delete unreferenced data files, then empty version dirs
    val dataRoot = new File(path, "data")
    Option(dataRoot.listFiles()).toSeq.flatten.filter(_.isDirectory)
      .foreach { d =>
        Option(d.listFiles()).toSeq.flatten
          .filter(f => f.isFile && !live.contains(f.getPath))
          .foreach { f => if (f.delete()) dropped += 1 }
        val left = Option(d.listFiles()).toSeq.flatten
        if (left.forall(f => !f.getName.endsWith(".parquet"))) {
          left.foreach(_.delete()); d.delete(): Unit
        }
      }
    dropped
  }
}
