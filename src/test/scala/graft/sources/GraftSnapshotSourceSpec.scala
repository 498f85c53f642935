package graft.sources

import graft.SparkSpec
import graft.sinks.SnapshotStore
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions.col

/** The registered `graft` data source: read/write/time-travel through
  * spark.read/write.format, SQL USING views, and filter pushdown into
  * the stats-checkpoint file prune. */
class GraftSnapshotSourceSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft-dsv1").toString + "/t"

  test("format(\"graft\"): write, append, read head and pinned versions") {
    val path = fresh()
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .write.format("graft").option("statsKey", "id").save(path)
    Seq((3L, "c")).toDF("id", "s")
      .write.format("graft").option("statsKey", "id")
      .mode(SaveMode.Append).save(path)

    val head = spark.read.format("graft").load(path)
      .as[(Long, String)].collect().toSet
    assert(head == Set((1L, "a"), (2L, "b"), (3L, "c")))

    val v1 = spark.read.format("graft").option("versionAsOf", 1).load(path)
      .as[(Long, String)].collect().toSet
    assert(v1 == Set((1L, "a"), (2L, "b")))

    // timestampAsOf resolves through the shared rule
    val ts1 = SnapshotStore.commitTime(path, 1)
    val t1 = spark.read.format("graft").option("timestampAsOf", ts1)
      .load(path).as[(Long, String)].collect().toSet
    assert(t1 == v1)

    // a view over the source works from bare SQL
    spark.sql(
      s"CREATE OR REPLACE TEMPORARY VIEW graft_src_spec USING graft " +
        s"OPTIONS (path '$path')")
    assert(spark.sql("SELECT count(*) AS n FROM graft_src_spec")
      .head().getLong(0) == 3L)
  }

  test("pushed range filter prunes files via the stats checkpoint") {
    val path = fresh()
    // two range-disjoint files under one version: id 0..99 and 1000..1099
    Seq.tabulate(100)(i => (i.toLong, s"lo$i")).toDF("id", "s")
      .coalesce(1).write.format("graft").option("statsKey", "id").save(path)
    Seq.tabulate(100)(i => (1000L + i, s"hi$i")).toDF("id", "s")
      .coalesce(1).write.format("graft").option("statsKey", "id")
      .mode(SaveMode.Append).save(path)

    val df = spark.read.format("graft").load(path).filter(col("id") >= 1000L)
    // result correctness: exactly the high range, same as readWhere
    val got = df.as[(Long, String)].collect().toSet
    val want = SnapshotStore
      .readWhere(spark, path, "id", 1000L, Long.MaxValue)
      .as[(Long, String)].collect().toSet
    assert(got == want && got.size == 100)
    // the pruned scan reads ONE file's rows: prove it by the relation
    // contract — the same filter through readWhere opens one file, and
    // the source delegates to it (equality above); a no-stats column
    // filter still answers correctly (degrade-to-scan rule)
    val bySeq = spark.read.format("graft").load(path)
      .filter(col("s") === "hi5").as[(Long, String)].collect().toSet
    assert(bySeq == Set((1005L, "hi5")))
  }

  test("string equality pushdown prunes to the partition's files (r18)") {
    val path = fresh()
    // two value-disjoint files: partitions a* and b*
    Seq.tabulate(50)(i => (i.toLong, s"a$i")).toDF("id", "p")
      .coalesce(1).write.format("graft").option("statsKey", "id").save(path)
    Seq.tabulate(50)(i => (100L + i, s"b$i")).toDF("id", "p")
      .coalesce(1).write.format("graft").option("statsKey", "id")
      .mode(SaveMode.Append).save(path)
    // through the registered source: a pushed p = 'b5' must answer
    // exactly and delegate to the equality prune (readWhereEq parity)
    val got = spark.read.format("graft").load(path)
      .filter(col("p") === "b5").as[(Long, String)].collect().toSet
    assert(got == Set((105L, "b5")))
    // the prune itself: readWhereEq opens only the b-file
    val eq = SnapshotStore.readWhereEq(spark, path, "p", "b5")
    assert(eq.inputFiles.length == 1,
      s"${eq.inputFiles.length}: the a-file's [a0,a9] range excludes b5")

    // string WINDOW pushdown (the date-BETWEEN shape): both bounds on
    // one string column drive readWhereBetween's lexicographic prune
    val win = spark.read.format("graft").load(path)
      .filter(col("p") >= "b0" && col("p") <= "b9")
    assert(win.count() == 50)
    val bw = SnapshotStore.readWhereBetween(spark, path, "p", "b0", "b9")
    assert(bw.inputFiles.length == 1,
      s"${bw.inputFiles.length}: the window excludes the a-file")
  }

  test("explain shows the pushed filters reaching the graft relation") {
    val path = fresh()
    Seq((1L, "a")).toDF("id", "s")
      .write.format("graft").option("statsKey", "id").save(path)
    val plan = spark.read.format("graft").load(path)
      .filter(col("id") === 1L).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("EqualTo(id,1)"), s"pushdown missing from plan:\n$plan")
  }

  test("SQL INSERT INTO / INSERT OVERWRITE a USING-graft view commits snapshots") {
    val path = fresh()
    Seq((1L, "a")).toDF("id", "s")
      .write.format("graft").option("statsKey", "id").save(path)
    spark.sql(
      s"CREATE OR REPLACE TEMPORARY VIEW graft_ins_spec USING graft " +
        s"OPTIONS (path '$path', statsKey 'id')")
    spark.sql("INSERT INTO graft_ins_spec VALUES (2, 'b')")
    assert(SnapshotStore.read(spark, path).as[(Long, String)]
      .collect().toSet == Set((1L, "a"), (2L, "b")))
    spark.sql("INSERT OVERWRITE graft_ins_spec VALUES (9, 'z')")
    assert(SnapshotStore.read(spark, path).as[(Long, String)]
      .collect().toSet == Set((9L, "z")))
    assert(SnapshotStore.latestVersion(path) == 3L) // one commit per insert
  }

  test("writeStream.format(\"graft\"): micro-batches land exactly once") {
    val path = fresh()
    val src = java.nio.file.Files.createTempDirectory("graft-sink-src")
    val ck = java.nio.file.Files.createTempDirectory("graft-sink-ck").toString
    def feed(name: String, lines: String*): Unit =
      java.nio.file.Files.write(src.resolve(name),
        lines.mkString("\n").getBytes("UTF-8"))
    feed("a.csv", "1,a", "2,b")
    val stream = spark.readStream
      .schema("id LONG, s STRING").csv(src.toString)
    val q = stream.writeStream.format("graft")
      .option("path", path).option("checkpointLocation", ck).start()
    try {
      q.processAllAvailable()
      assert(SnapshotStore.read(spark, path).as[(Long, String)]
        .collect().toSet == Set((1L, "a"), (2L, "b")))
      feed("b.csv", "3,c")
      q.processAllAvailable()
      assert(SnapshotStore.read(spark, path).as[(Long, String)]
        .collect().toSet == Set((1L, "a"), (2L, "b"), (3L, "c")))
    } finally q.stop()
    // a replayed batch id is skipped by the sink's batch-id rule
    val v = SnapshotStore.latestVersion(path)
    SnapshotStore.streamSink(path)(
      Seq((3L, "c")).toDF("id", "s"), 1L)
    assert(SnapshotStore.latestVersion(path) == v)
  }

  test("overwrite through the source resets the table; count(*) projection works") {
    val path = fresh()
    Seq((1L, "a")).toDF("id", "s").write.format("graft").save(path)
    Seq((9L, "z")).toDF("id", "s").write.format("graft")
      .mode(SaveMode.Overwrite).save(path)
    val df = spark.read.format("graft").load(path)
    assert(df.count() == 1L) // empty projection path
    assert(df.as[(Long, String)].head() == ((9L, "z")))
  }

  test("readChangeFeed option: the changelog through the standard read surface") {
    val path = fresh()
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .write.format("graft").save(path)
    Seq((1L, "a"), (2L, "B"), (3L, "c")).toDF("id", "s")
      .write.format("graft").mode(SaveMode.Overwrite).save(path)
    // startingVersion is INCLUSIVE (Delta parity): the default feed
    // begins with v1's rows as inserts, then the keyed v1→v2 changes
    // ((2,B)=update, (3,c)=insert; identical rewrite (1,a) suppressed)
    val keyed = spark.read.format("graft")
      .option("readChangeFeed", "true").option("key", "id").load(path)
      .select("id", "_change").as[(Long, String)].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(keyed == Map((1L, "insert") -> 1, (2L, "insert") -> 1,
      (2L, "update") -> 1, (3L, "insert") -> 1))
    // startingVersion = 2: just that commit's diff — equal to the
    // library call over baseline 1
    val v2only = spark.read.format("graft")
      .option("readChangeFeed", "true").option("key", "id")
      .option("startingVersion", "2").load(path)
      .select("id", "_change").as[(Long, String)].collect().toSet
    assert(v2only == Set((2L, "update"), (3L, "insert")))
    val lib = SnapshotStore.readChanges(spark, path, 1, 2, Some("id"))
      .select("id", "_change").as[(Long, String)].collect().toSet
    assert(v2only == lib)
    // unkeyed from the beginning: v1 bootstrap inserts + the raw file
    // delta of v2 (3 inserts, 2 deletes)
    val raw = spark.read.format("graft")
      .option("readChangeFeed", "true")
      .option("startingVersion", "1").option("endingVersion", "2").load(path)
      .select("id", "_change").as[(Long, String)].collect()
    assert(raw.count(_._2 == "insert") == 5 && raw.count(_._2 == "delete") == 2)
  }

  test("CHECK constraints: violating commits abort untouched, NULL passes, add validates existing rows") {
    val path = fresh()
    Seq((1L, 10L), (2L, 20L)).toDF("id", "v")
      .write.format("graft").save(path)
    SnapshotStore.addConstraint(spark, path, "v-positive", "v > 0")
    // violating append (through the registered source) aborts...
    val ex = intercept[Exception] {
      Seq((3L, -5L), (4L, 7L)).toDF("id", "v")
        .write.format("graft").mode(SaveMode.Append).save(path)
    }
    assert(ex.getMessage.contains("v-positive") ||
      Option(ex.getCause).exists(_.getMessage.contains("v-positive")))
    // ...and the table is untouched (no version landed, rows intact)
    assert(SnapshotStore.latestVersion(path) == 1)
    assert(spark.read.format("graft").load(path).count() == 2)
    // NULL passes (SQL CHECK semantics)
    Seq((5L, Option.empty[Long]), (6L, Some(8L))).toDF("id", "v")
      .write.format("graft").mode(SaveMode.Append).save(path)
    assert(SnapshotStore.latestVersion(path) == 2)
    // mergeCommit enforces too
    intercept[Exception] {
      SnapshotStore.mergeCommit(spark, path,
        Seq((6L, -1L)).toDF("id", "v"), "id")
    }
    assert(SnapshotStore.latestVersion(path) == 2)
    // adding a constraint the EXISTING table violates is rejected
    intercept[Exception] {
      SnapshotStore.addConstraint(spark, path, "v-small", "v < 5")
    }
    assert(SnapshotStore.tableConstraints(path).map(_._1) == Seq("v-positive"))
    // the OPTIMISTIC write paths enforce too
    intercept[Exception] {
      SnapshotStore.commitIf(Seq((8L, -2L)).toDF("id", "v"), path,
        SnapshotStore.latestVersion(path))
    }
    intercept[Exception] {
      SnapshotStore.mergeCommitIf(spark, path,
        Seq((6L, -3L)).toDF("id", "v"), "id",
        SnapshotStore.latestVersion(path))
    }
    assert(SnapshotStore.latestVersion(path) == 2)
    // renaming a constrained column is rejected (the expression would
    // stop resolving and brick every later commit)
    intercept[Exception] {
      SnapshotStore.renameColumn(spark, path, "v", "value")
    }
    // a constraint on an EMPTY table has no schema to resolve against
    intercept[Exception] {
      SnapshotStore.addConstraint(spark, fresh(), "x", "v > 0")
    }
    // dropping re-admits the data
    SnapshotStore.dropConstraint(path, "v-positive")
    Seq((7L, -5L)).toDF("id", "v")
      .write.format("graft").mode(SaveMode.Append).save(path)
    assert(SnapshotStore.latestVersion(path) == 3)
  }

  test("write-then-validate-then-publish: a NONDETERMINISTIC violating batch is rejected on its materialized rows, zero garbage left (r17)") {
    val path = fresh()
    Seq((1L, 10L)).toDF("id", "v").write.format("graft").save(path)
    SnapshotStore.addConstraint(spark, path, "v-positive", "v > 0")
    def dataDirs = Option(new java.io.File(path, "data").listFiles())
      .toSeq.flatten.map(_.getName).toSet
    val before = dataDirs
    // the batch's lineage is nondeterministic (rand()); its
    // materialization always violates — the r16-advice hazard was a
    // pre-write check evaluating DIFFERENT rows than the write
    intercept[SnapshotStore.ConstraintViolationException] {
      SnapshotStore.commit(
        spark.range(3).select(col("id"),
          (-org.apache.spark.sql.functions.rand() - 1.0).cast("long")
            .as("v")),
        path, SaveMode.Append)
    }
    assert(SnapshotStore.latestVersion(path) == 1)
    assert(dataDirs == before,
      "a rejected batch must leave no orphan data directory")
    assert(SnapshotStore.read(spark, path).count() == 1)
    // rewrite-only maintenance is NOT re-validated (Delta's OPTIMIZE
    // rule): compaction of a passing table under its constraint works
    SnapshotStore.compact(spark, path, targetBytes = 1L << 30)
    assert(SnapshotStore.read(spark, path).count() == 1)
  }
}
