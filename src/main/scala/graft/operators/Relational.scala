package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Relational-completeness operators: semi/anti joins, set operations,
  * CUBE, ordered string aggregation, correlated subqueries (through the
  * SQL surface), and RANGE-frame windows.
  */
object Relational {

  private val P = DecimalType(9, 2)

  /** Semi/anti joins: customers with vs without orders, per segment.
    * left_semi/left_anti are Spark's EXISTS / NOT EXISTS — no
    * row multiplication, build side only carries the key. */
  def semiAnti(t: Tables): DataFrame = {
    val ok = t.orders.select(col("o_custkey"))
    val withO = t.customer.join(ok, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_with"))
    val withoutO = t.customer.join(ok, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_without"))
    withO.join(withoutO, Seq("c_mktsegment"), "full")
      .na.fill(0L, Seq("n_with", "n_without"))
      .orderBy(col("c_mktsegment"))
  }

  /** INTERSECT / EXCEPT / UNION over distinct key sets (one-row out). */
  def setOps(t: Tables): DataFrame = {
    def custs(y: Int) = t.orders
      .filter(year(col("o_orderdate")) === y).select(col("o_custkey")).distinct()
    val a = custs(1995); val b = custs(1996)
    val nBoth = a.intersect(b).agg(count(lit(1)).as("n_both"))
    val nOnly = a.except(b).agg(count(lit(1)).as("n_only_95"))
    val nUnion = a.union(b).distinct().agg(count(lit(1)).as("n_union"))
    nBoth.crossJoin(nOnly).crossJoin(nUnion)
  }

  /** CUBE over (status, order year) with exact decimal totals. */
  def cubeAgg(t: Tables): DataFrame =
    t.orders
      .select(col("o_orderstatus"),
        year(col("o_orderdate")).cast("long").as("o_year"),
        col("o_totalprice"))
      .cube(col("o_orderstatus"), col("o_year"))
      .agg(sum(col("o_totalprice").cast(P)).cast(DoubleType).as("sum_price"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_year").asc_nulls_first)

  /** Ordered string aggregation (listagg): deterministic via
    * collect_list → array_sort → array_join (matches DuckDB's
    * string_agg ... ORDER BY). */
  def stringAgg(t: Tables): DataFrame =
    t.supplier
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(array_join(array_sort(collect_list(col("s_name"))), ",").as("suppliers"),
        count(lit(1)).as("n_sup"))
      .orderBy(col("n_name"))

  /** Correlated scalar subquery through the SQL surface — Catalyst
    * decorrelates it into an aggregate + join; the decimal-exact inner
    * average keeps the predicate boundary deterministic cross-engine. */
  val SubquerySql: String =
    """SELECT o.o_custkey, COUNT(*) AS n_big
      |FROM orders o
      |WHERE o.o_totalprice > 1.5 * (
      |  SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(9,2))) AS DOUBLE) / COUNT(*)
      |  FROM orders i WHERE i.o_custkey = o.o_custkey)
      |GROUP BY o.o_custkey
      |ORDER BY o.o_custkey""".stripMargin

  def subquery(t: Tables): DataFrame =
    graft.GraftSql.query(t.spark, t.dir, SubquerySql)

  /** NOT IN vs a NULL-bearing subquery — the three-valued-logic trap
    * SQL engines must agree on: a NULL in the IN-list makes every
    * non-match UNKNOWN, so the null-polluted NOT IN keeps ONLY nothing,
    * while the null-filtered twin behaves like a plain anti join. Spark
    * plans the former as a null-aware anti join (broadcast of the
    * in-list + null flag), not a per-row subquery. Same SQL text runs
    * on both engines. */
  val NotInNullSql: String =
    """SELECT
      |  (SELECT COUNT(*) FROM orders
      |   WHERE o_custkey NOT IN (SELECT NULLIF(user_id, 13) FROM events)) AS n_polluted,
      |  (SELECT COUNT(*) FROM orders
      |   WHERE o_custkey NOT IN (SELECT NULLIF(user_id, 13) FROM events
      |                           WHERE NULLIF(user_id, 13) IS NOT NULL)) AS n_filtered,
      |  (SELECT COUNT(*) FROM orders
      |   WHERE o_custkey IN (SELECT NULLIF(user_id, 13) FROM events)) AS n_in""".stripMargin

  def notInNull(t: Tables): DataFrame =
    graft.GraftSql.query(t.spark, t.dir, NotInNullSql)

  /** RANGE-frame window: orders in the trailing 90 days per customer
    * (value-based frame over the epoch, not a row count). */
  def rangeWindow(t: Tables): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("od_epoch"))
      .rangeBetween(-90L * 86400, 0)
    t.orders
      .select(col("o_custkey"), col("o_orderkey"),
        unix_timestamp(col("o_orderdate")).as("od_epoch"))
      .withColumn("n_trailing_90d", count(lit(1)).over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("n_trailing_90d"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Explicit GROUPING SETS (neither rollup nor cube) — same SQL text
    * runs on both engines via the SQL surface. */
  val GroupingSetsSql: String =
    """SELECT o_orderpriority, o_orderstatus,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(9,2))) AS DOUBLE) AS sum_price,
      |       COUNT(*) AS n
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
      |ORDER BY o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""".stripMargin

  def groupingSets(t: Tables): DataFrame =
    graft.GraftSql.query(t.spark, t.dir, GroupingSetsSql)

  /** NULL-semantics kernels: COALESCE, NULLIF, null-safe equality. */
  def nullSemantics(t: Tables): DataFrame = {
    val maybe = when(col("o_orderkey") % 3 =!= 0, col("o_totalprice"))
    val maybe2 = when(col("o_orderkey") % 5 =!= 0, col("o_totalprice"))
    t.orders.select(
        col("o_orderkey"),
        coalesce(maybe, lit(-1.0)).as("price_or_default"),
        nullif(col("o_orderstatus"), lit("O")).as("status_non_open"),
        (maybe <=> maybe2).as("nullsafe_eq"),
        maybe.isNull.as("was_null"))
      .orderBy(col("o_orderkey"))
  }

  /** Date/time arithmetic kernel coverage (add, diff, truncation,
    * calendar fields) — all codegen'd scalar expressions. */
  def dateMath(t: Tables): DataFrame = {
    val od = col("o_orderdate").cast("date")
    t.orders.select(
        col("o_orderkey"),
        od.as("od"),
        date_add(od, 30).as("due_date"),
        datediff(od, lit("1970-01-01").cast("date")).cast("long").as("epoch_days"),
        last_day(od).as("month_end"),
        quarter(od).cast("long").as("qtr"),
        (dayofweek(od) - 1).cast("long").as("dow"), // Sunday=0, DuckDB convention
        trunc(od, "month").as("month_start"))
      .orderBy(col("o_orderkey"))
  }

  /** String-function kernel coverage (pad, translate, reverse,
    * levenshtein, repeat, split_part, left). */
  def strFuncs(t: Tables): DataFrame =
    t.part.select(
        col("p_partkey"),
        lpad(col("p_size").cast("string"), 4, "0").as("size_pad"),
        translate(col("p_type"), "aeiou", "AEIOU").as("type_tr"),
        reverse(col("p_name")).as("name_rev"),
        levenshtein(col("p_brand"), lit("Brand#11")).cast("long").as("lev"),
        expr("repeat('*', p_size % 5)").as("stars"),
        expr("split_part(p_type, ' ', 2)").as("type_mid"),
        expr("left(p_name, 5)").as("name_l"))
      .orderBy(col("p_partkey"))

  /** Regex kernel coverage: group extraction, anchors, rlike. */
  def regexExtract(t: Tables): DataFrame =
    t.part.select(
        col("p_partkey"),
        regexp_extract(col("p_type"), "^(\\w+)", 1).as("type_first"),
        regexp_extract(col("p_name"), "(\\w+)$", 1).as("name_last"),
        col("p_brand").rlike("[0-9]").as("brand_has_digit"))
      .orderBy(col("p_partkey"))

  /** GROUP BY ... HAVING (post-aggregation predicate). */
  def havingAgg(t: Tables): DataFrame =
    t.orders.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= 15)
      .orderBy(col("o_custkey"))

  /** Fixed-width histogram bucketing of a continuous column. */
  def histogram(t: Tables): DataFrame =
    t.events
      .groupBy(floor(col("value") / 20.0).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("bucket"))

  /** NTILE quartiles per group (full deterministic order). */
  def ntileQuartiles(t: Tables): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t.orders
      .select(col("o_orderpriority"), col("o_orderkey"),
        ntile(4).over(w).cast("long").as("quartile"))
      .groupBy(col("o_orderpriority"), col("quartile"))
      .agg(count(lit(1)).as("n"), min(col("o_orderkey")).as("first_key"))
      .orderBy(col("o_orderpriority"), col("quartile"))
  }

  /** first/last over a fully-specified window frame. */
  def firstLast(t: Tables): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t.orders.filter(col("o_custkey") < 20)
      .select(col("o_orderpriority"), col("o_orderkey"),
        first(col("o_orderkey")).over(w).as("first_key"),
        last(col("o_orderkey")).over(w).as("last_key"))
      .orderBy(col("o_orderpriority"), col("o_orderkey"))
  }

  /** Array kernel coverage: split → sort / distinct-count / slice /
    * membership / join — the list algebra the nested document model
    * (SURVEY R11/R13 keywords, units arrays) leans on, as codegen'd
    * scalar expressions rather than explode→re-aggregate round-trips. */
  def arrayFuncs(t: Tables): DataFrame = {
    val toks = split(col("p_name"), " ")
    t.part.select(
        col("p_partkey"),
        size(toks).cast("long").as("n_words"),
        size(array_distinct(toks)).cast("long").as("n_distinct"),
        array_join(slice(sort_array(toks), 1, 3), "-").as("first3_sorted"),
        array_contains(toks, "green").as("has_green"),
        element_at(sort_array(toks, asc = false), 1).as("max_word"))
      .orderBy(col("p_partkey"))
  }

  /** TPC-H Q6 shape: single-table filter + exact-decimal agg — the
    * pushdown showcase (both predicates reach the parquet reader;
    * only 3 columns are read). */
  def q6Forecast(t: Tables): DataFrame =
    t.lineitem
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(sum((col("l_extendedprice").cast(P) * col("l_discount").cast(DecimalType(4, 2))))
        .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_lines"))

  /** TPC-H Q4 shape: EXISTS (left-semi) against a filtered lineitem,
    * counted per order priority. The semi join carries only the key —
    * no row multiplication on multi-line orders. (This schema has no
    * l_commitdate; returned lines (l_returnflag='R') stand in as the
    * "problem lines" predicate.) */
  def q4Priority(t: Tables): DataFrame = {
    val returned = t.lineitem.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"))
    t.orders
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      .join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q12 shape: conditional two-way aggregation (CASE inside
    * SUM) after a join — one shuffle, the CASE runs map-side. (No
    * l_shipmode in this schema; l_linestatus plays the group key.) */
  def q12Shipmode(t: Tables): DataFrame =
    t.lineitem
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("low_line_count"))
      .orderBy(col("l_linestatus"))

  /** TPC-H Q14 shape: promo-revenue ratio — conditional exact-decimal
    * numerator over exact-decimal denominator, one double division at
    * the end. The part join is unhinted: part is SF-linear (full table,
    * no slice), so AQE picks broadcast only while it actually fits. */
  def q14Promo(t: Tables): DataFrame = {
    val disc = col("l_extendedprice").cast(P) *
      (lit(1).cast(DecimalType(4, 2)) - col("l_discount").cast(DecimalType(4, 2)))
    t.lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-07-01").cast("timestamp"))
      .join(t.part, col("l_partkey") === col("p_partkey"))
      .agg(
        (sum(when(col("p_type").startsWith("PROMO"), disc).otherwise(lit(0).cast(P)))
          .cast(DoubleType) * 100.0 /
          sum(disc).cast(DoubleType)).as("promo_revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** Ranking-function kernels: percent_rank, cume_dist, nth_value over
    * an explicit full frame (nth_value's default running frame would
    * make the first two rows NULL — the full frame pins one global
    * answer per partition). All exact rational outputs. */
  def rankFuncs(t: Tables): DataFrame = {
    val ord = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t.orders.filter(col("o_custkey") < 50)
      .select(col("o_orderpriority"), col("o_orderkey"),
        percent_rank().over(ord).as("pr"),
        cume_dist().over(ord).as("cd"),
        nth_value(col("o_orderkey"), 3).over(full).as("third_key"))
      .orderBy(col("o_orderpriority"), col("o_orderkey"))
  }

  /** Wide→long unpivot of the per-user event-type counts (the inverse
    * of q_pivot): melt runs map-side — each wide row emits its k
    * (metric, value) pairs with no shuffle beyond the source pivot's. */
  def unpivotCounts(t: Tables): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val wide = t.events.groupBy(col("user_id"))
      .pivot(col("event_type"), types)
      .agg(count(lit(1)))
      .na.fill(0L, types)
    wide.unpivot(Array(col("user_id")),
        types.map(tp => col(tp).as(s"n_$tp")).toArray,
        "metric", "v")
      .filter(col("user_id") < 200)
      .orderBy(col("user_id"), col("metric"))
  }

  /** Hopping (sliding) time windows as a batch query: Spark's
    * `window(ts, 1h, 30m)` assigns each row to length/slide = 2
    * epoch-aligned windows — the same generator the streaming engine
    * uses, so the batch oracle doubles as the streaming semantics
    * check. The explode is map-side; one shuffle for the aggregate. */
  def hopWindow(t: Tables): DataFrame =
    t.events
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))
      .orderBy(col("win_start"), col("event_type"))

  /** CDC-style snapshot diff: classify every key across two table
    * versions as inserted / deleted / updated / same via ONE full
    * outer join on the key — the incremental-pipeline primitive that
    * turns periodic full snapshots into a change stream. Both
    * "snapshots" are deterministic slices of orders so the oracle sees
    * identical inputs. One shuffle; the classify CASE is map-side. */
  def snapshotDiff(t: Tables): DataFrame = {
    val o = t.orders.select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val old = o.filter(col("o_orderkey") % 10 =!= 0)
      .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st_o"),
        col("o_totalprice").as("pr_o"))
    val neu = o.filter(col("o_orderkey") % 7 =!= 0)
      .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st_n"),
        (when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice"))).as("pr_n"))
    old.join(neu, Seq("k"), "full")
      .select(col("k"),
        when(col("st_o").isNull, "I")
          .when(col("st_n").isNull, "D")
          .when(!(col("pr_o") <=> col("pr_n")) || !(col("st_o") <=> col("st_n")), "U")
          .otherwise("S").as("change"))
      .groupBy(col("change"))
      .agg(count(lit(1)).as("n"), min(col("k")).as("first_key"), max(col("k")).as("last_key"))
      .orderBy(col("change"))
  }

  /** [[snapshotDiff]]'s classification driven through the REAL table
    * layer (oracled CDC): the two deterministic order slices are
    * COMMITTED as SnapshotStore versions 1 and 2 of a scratch table,
    * and the changelog comes from
    * [[graft.sinks.SnapshotStore.readChanges]] — manifest
    * set-difference file pruning, keyed full-outer classification,
    * identical-rewrite suppression — aggregated to the same
    * (change, n, first_key, last_key) shape. The oracle replays the
    * classification as the plain full-outer join over the slices
    * (minus the 'S' row readChanges suppresses by design), so the
    * whole commit → manifest → CDC-read path is gated on result
    * equality, not just specs. */
  def snapshotCdc(t: Tables): DataFrame = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-cdc").toString + "/t"
    val o = t.orders.select(col("o_orderkey"), col("o_orderstatus"),
      col("o_totalprice"))
    val v1 = o.filter(col("o_orderkey") % 10 =!= 0)
    val v2 = o.filter(col("o_orderkey") % 7 =!= 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice")).as("o_totalprice"))
    graft.sinks.SnapshotStore.commit(v1, dir)
    graft.sinks.SnapshotStore.commit(v2, dir)
    graft.sinks.SnapshotStore
      .readChanges(t.spark, dir, 1, 2, Some("o_orderkey"))
      .select(col("o_orderkey").as("k"),
        expr("CASE _change WHEN 'insert' THEN 'I' WHEN 'delete' THEN 'D' ELSE 'U' END")
          .as("change"))
      .groupBy(col("change"))
      .agg(count(lit(1)).as("n"), min(col("k")).as("first_key"),
        max(col("k")).as("last_key"))
      .orderBy(col("change"))
  }

  /** Row-level DELETE driven through the REAL table layer (r15,
    * oracled): orders are committed range-partitioned WITH the stats
    * sidecar, a deterministic key slice (o_orderkey % 13 = 0) is
    * removed via [[graft.sinks.SnapshotStore.deleteCommit]] — the
    * stats-pruned takedown path (only key-range-overlapping files
    * rewritten; here every file overlaps some deleted key, which
    * exercises the rewrite arm, while SnapshotStoreSpec pins the
    * pruning arm) — and the output joins the LIVE table's per-status
    * totals with the keyed CDC delta's per-status delete counts
    * (deletes carry the OLD payload). The oracle replays both sides
    * as plain slices of orders, so the commit → stats → delete →
    * changelog loop is gated on result equality. */
  def snapshotDelete(t: Tables): DataFrame = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-del").toString + "/t"
    val o = t.orders.select(col("o_orderkey"), col("o_orderstatus"))
    graft.sinks.SnapshotStore.commit(
      o.repartitionByRange(8, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey"),
      dir, statsKey = Some("o_orderkey"))
    graft.sinks.SnapshotStore.deleteCommit(t.spark, dir,
      o.filter(col("o_orderkey") % 13 === 0).select(col("o_orderkey")),
      "o_orderkey")
    val live = graft.sinks.SnapshotStore.read(t.spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_live"),
        min(col("o_orderkey")).as("first_live"),
        max(col("o_orderkey")).as("last_live"))
    val dels = graft.sinks.SnapshotStore
      .readChanges(t.spark, dir, 1, 2, Some("o_orderkey"))
      .filter(col("_change") === "delete")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_deleted"))
    live.join(dels, Seq("o_orderstatus"), "full")
      .select(col("o_orderstatus"), coalesce(col("n_live"), lit(0L)).as("n_live"),
        col("first_live"), col("last_live"),
        coalesce(col("n_deleted"), lit(0L)).as("n_deleted"))
      .orderBy(col("o_orderstatus"))
  }

  /** VERSION-ATTRIBUTED CDC through the real table layer (r17,
    * oracled — Delta CDF's `_commit_version` column): three commits
    * (base, overwrite-with-updates, stats-less key delete) read back
    * via [[graft.sinks.SnapshotStore.readChangesVersioned]] — one
    * keyed per-commit delta per version, each row stamped with the
    * version that produced it (where the coalesced readChanges range
    * suppresses round trips, the versioned feed attributes every
    * commit's changes — Delta's semantics). The oracle replays each
    * step diff with its literal version. */
  def cdcVersions(t: Tables): DataFrame = {
    import graft.sinks.SnapshotStore
    val dir = java.nio.file.Files
      .createTempDirectory("graft-cdcv").toString + "/t"
    val o = t.orders.select(col("o_orderkey"), col("o_orderstatus"),
      col("o_totalprice"))
    val v1 = o.filter(col("o_orderkey") % 10 =!= 0)
    val v2 = o.filter(col("o_orderkey") % 7 =!= 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice")).as("o_totalprice"))
    SnapshotStore.commit(v1, dir)
    SnapshotStore.commit(v2, dir)
    SnapshotStore.deleteCommit(t.spark, dir,
      o.filter(col("o_orderkey") % 13 === 0).select(col("o_orderkey")),
      "o_orderkey")
    SnapshotStore
      .readChangesVersioned(t.spark, dir, 1, 3, Some("o_orderkey"))
      .select(col("_commit_version").as("commit_v"),
        expr("CASE _change WHEN 'insert' THEN 'I' WHEN 'delete' THEN 'D' ELSE 'U' END")
          .as("change"),
        col("o_orderkey").as("k"))
      .groupBy(col("commit_v"), col("change"))
      .agg(count(lit(1)).as("n"), min(col("k")).as("first_key"),
        max(col("k")).as("last_key"))
      .orderBy(col("commit_v"), col("change"))
  }

  /** DELETION VECTORS driven through the REAL table layer (r17,
    * oracled): orders are committed range-partitioned with the stats
    * sidecar, a deterministic key slice is removed via
    * [[graft.sinks.SnapshotStore.deleteVectorCommit]] — ZERO data
    * files written, rows masked in the (file, row_index) sidecar —
    * then the table is COMPACTED (the masks materialize and become
    * inert). Output joins the live per-status totals (read through
    * the post-compaction version) with the keyed CDC delete counts of
    * the DV commit itself (deletes with no file-level change). The
    * oracle replays both sides as plain order slices, so mask →
    * masked-read → DV-CDC → materialization is one DuckDB-gated
    * loop. */
  def snapshotDv(t: Tables): DataFrame = {
    import graft.sinks.SnapshotStore
    val dir = java.nio.file.Files
      .createTempDirectory("graft-dv").toString + "/t"
    val o = t.orders.select(col("o_orderkey"), col("o_orderstatus"))
    SnapshotStore.commit(
      o.repartitionByRange(8, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey"),
      dir, statsKey = Some("o_orderkey"))
    SnapshotStore.deleteVectorCommit(t.spark, dir,
      o.filter(col("o_orderkey") % 11 === 0).select(col("o_orderkey")),
      "o_orderkey")
    SnapshotStore.compact(t.spark, dir, targetBytes = 16L << 20)
    val live = SnapshotStore.read(t.spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_live"),
        min(col("o_orderkey")).as("first_live"),
        max(col("o_orderkey")).as("last_live"))
    val dels = SnapshotStore
      .readChanges(t.spark, dir, 1, 2, Some("o_orderkey"))
      .filter(col("_change") === "delete")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_deleted"))
    live.join(dels, Seq("o_orderstatus"), "full")
      .select(col("o_orderstatus"),
        coalesce(col("n_live"), lit(0L)).as("n_live"),
        col("first_live"), col("last_live"),
        coalesce(col("n_deleted"), lit(0L)).as("n_deleted"))
      .orderBy(col("o_orderstatus"))
  }

  /** SQL MERGE INTO driven through the REAL table layer (r17,
    * oracled): an orders slice is committed range-partitioned with the
    * stats sidecar, then [[graft.sinks.SnapshotStore.mergeInto]]
    * applies the full conditional-clause form — WHEN MATCHED AND
    * price-cond THEN UPDATE (first-match-wins over) WHEN MATCHED AND
    * status-cond THEN DELETE, WHEN NOT MATCHED AND parity-cond THEN
    * INSERT — and the output aggregates the LIVE table per final
    * status. The oracle replays every clause as a FULL OUTER JOIN +
    * CASE ladder in DuckDB, so clause ordering, conditional deletes,
    * filtered inserts, and the carried untouched rows are all gated on
    * result equality.
    *
    * Scale: the rewrite is stats-pruned to key-overlapping files and
    * the commit is an O(delta) manifest — at 100 TB a point-key MERGE
    * rewrites one file, whatever the clause set. */
  def mergeIntoDemo(t: Tables): DataFrame = {
    import graft.sinks.SnapshotStore
    val dir = java.nio.file.Files
      .createTempDirectory("graft-mrg").toString + "/t"
    val o = t.orders.select(col("o_orderkey"), col("o_orderstatus"),
      col("o_totalprice"))
    SnapshotStore.commit(
      o.filter(col("o_orderkey") % 10 < 5)
        .repartitionByRange(8, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey"),
      dir, statsKey = Some("o_orderkey"))
    val source = o
      .filter(col("o_orderkey") % 10 >= 3 && col("o_orderkey") % 10 <= 7)
      .select(col("o_orderkey"), lit("N").as("o_orderstatus"),
        (col("o_totalprice") * 2).as("o_totalprice"))
    SnapshotStore.mergeInto(t.spark, dir, source, "o_orderkey",
      matched = Seq(
        SnapshotStore.MergeUpdate(
          Map("o_totalprice" -> "s.o_totalprice", "o_orderstatus" -> "'U'"),
          Some("t.o_totalprice < 150000")),
        SnapshotStore.MergeDelete(Some("t.o_orderstatus = 'F'"))),
      notMatched =
        Some(SnapshotStore.MergeInsert(Some("s.o_orderkey % 2 = 0"))))
    SnapshotStore.read(t.spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        min(col("o_orderkey")).as("first_key"),
        max(col("o_orderkey")).as("last_key"),
        sum(expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)"))
          .as("sum_cents"))
      .orderBy(col("o_orderstatus"))
  }

  /** Stats-sidecar scan PLANNING driven through the REAL table layer
    * (r15, oracled): orders are committed range-partitioned WITH the
    * stats sidecar, and a key-range slice is read back via
    * [[graft.sinks.SnapshotStore.readWhere]] — file-level pruning from
    * the driver-resident sidecar (only files whose recorded (min, max)
    * overlaps the interval enter the plan; SnapshotStoreSpec pins the
    * inputFiles subset) with the residual row filter pushed into the
    * surviving parquet scans. The oracle replays the same range as a
    * plain WHERE over orders, so manifest + sidecar + prune + read is
    * gated on result equality. At 100 TB this is the read path that
    * turns a point/range lookup from "open every footer" into "open
    * the two files the sidecar admits". */
  def snapshotPrune(t: Tables): DataFrame = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-prune").toString + "/t"
    val o = t.orders.select(col("o_orderkey"), col("o_orderstatus"),
      col("o_totalprice"))
    graft.sinks.SnapshotStore.commit(
      o.repartitionByRange(8, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey"),
      dir, statsKey = Some("o_orderkey"))
    graft.sinks.SnapshotStore
      .readWhere(t.spark, dir, "o_orderkey", 100L, 4000L)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        min(col("o_orderkey")).as("first_key"),
        max(col("o_orderkey")).as("last_key"),
        sum(col("o_totalprice").cast("decimal(12,2)")).cast("double")
          .as("sum_price"))
      .orderBy(col("o_orderstatus"))
  }

  /** ALL-COLUMN stats pruning through the REAL table layer (r18,
    * oracled — Delta's collect-stats-on-every-column default): orders
    * are committed clustered by o_totalprice but stats-tracked with
    * statsKey = o_orderkey — and the read filters on o_totalprice, a
    * column the caller never declared. The r18 all-column checkpoint
    * records (lo, hi) for every eligible column at commit, so
    * [[graft.sinks.SnapshotStore.readWhere]] on ANY filtered column
    * file-prunes (SnapshotStoreSpec pins the inputFiles subset); the
    * oracle replays the range as a plain WHERE. At 100 TB this is the
    * difference between "pruning works only on the one column the
    * writer thought of" and "every dashboard filter prunes". */
  def snapshotPruneMulti(t: Tables): DataFrame = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-prunem").toString + "/t"
    val o = t.orders.select(col("o_orderkey"), col("o_orderstatus"),
      col("o_totalprice"))
    graft.sinks.SnapshotStore.commit(
      o.repartitionByRange(8, col("o_totalprice"))
        .sortWithinPartitions("o_totalprice"),
      dir, statsKey = Some("o_orderkey"))
    graft.sinks.SnapshotStore
      .readWhere(t.spark, dir, "o_totalprice", 1000L, 50000L)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        min(col("o_orderkey")).as("first_key"),
        max(col("o_orderkey")).as("last_key"),
        sum(col("o_totalprice").cast("decimal(12,2)")).cast("double")
          .as("sum_price"))
      .orderBy(col("o_orderstatus"))
  }

  /** PARTITIONED-table equality pruning through the REAL table layer
    * (r18, oracled): orders are committed with `partitionBy =
    * o_orderstatus` — the table layer clusters rows so each status
    * value lands in contiguous files and records per-file
    * lexicographic value ranges — and the read is
    * [[graft.sinks.SnapshotStore.readWhereEq]] on one status value:
    * partition ELIMINATION without a Hive directory layout
    * (SnapshotStoreSpec pins the files-opened subset at 10×
    * partitions). The oracle replays the equality as a plain WHERE.
    * At 100 TB this is the date-partition prune every warehouse query
    * runs first. */
  def snapshotPartition(t: Tables): DataFrame = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-part").toString + "/t"
    val o = t.orders.select(col("o_orderkey"), col("o_orderstatus"),
      col("o_totalprice"))
    graft.sinks.SnapshotStore.commit(o, dir,
      statsKey = Some("o_orderkey"),
      partitionBy = Seq("o_orderstatus"))
    // appends re-cluster by the declared partition columns — the
    // second slice's files stay prunable too
    graft.sinks.SnapshotStore.readWhereEq(
        t.spark, dir, "o_orderstatus", "F")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        min(col("o_orderkey")).as("first_key"),
        max(col("o_orderkey")).as("last_key"),
        sum(col("o_totalprice").cast("decimal(12,2)")).cast("double")
          .as("sum_price"))
      .orderBy(col("o_orderstatus"))
  }

  /** RESTORE through the REAL table layer (r18, oracled — Delta's
    * RESTORE TABLE): v1 commits an orders slice; v2 masks a key slice
    * via deletion vectors (zero data files); v3 appends a disjoint
    * slice; then [[graft.sinks.SnapshotStore.restore]] republishes v1
    * as the new head — a metadata-only commit whose reset marker
    * RESURRECTS the masked rows and whose manifest drops the appended
    * files. The output is the keyed CDC classification of the restore
    * commit itself (resurrections = inserts through the reset-aware
    * arm; rolled-back appends = deletes) unioned with the live table's
    * totals, so the oracle gates BOTH the rollback diff and the
    * restored state. At 100 TB a restore costs one manifest write —
    * the immutable-file dividend. */
  def restoreDemo(t: Tables): DataFrame = {
    import graft.sinks.SnapshotStore
    val dir = java.nio.file.Files
      .createTempDirectory("graft-restore").toString + "/t"
    val o = t.orders.select(col("o_orderkey"), col("o_orderstatus"))
    SnapshotStore.commit(
      o.filter(col("o_orderkey") % 10 =!= 0)
        .repartitionByRange(8, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey"),
      dir, statsKey = Some("o_orderkey"))                          // v1
    SnapshotStore.deleteVectorCommit(t.spark, dir,
      o.filter(col("o_orderkey") % 11 === 0).select(col("o_orderkey")),
      "o_orderkey")                                                // v2
    SnapshotStore.commit(o.filter(col("o_orderkey") % 10 === 0), dir,
      org.apache.spark.sql.SaveMode.Append)                        // v3
    SnapshotStore.restore(t.spark, dir, 1L)                        // v4
    val cdc = SnapshotStore
      .readChanges(t.spark, dir, 3, 4, Some("o_orderkey"))
      .select(
        expr("CASE _change WHEN 'insert' THEN 'I' WHEN 'delete' THEN 'D' ELSE 'U' END")
          .as("change"),
        col("o_orderkey").as("k"))
      .groupBy(col("change"))
      .agg(count(lit(1)).as("n"), min(col("k")).as("first_key"),
        max(col("k")).as("last_key"))
    val live = SnapshotStore.read(t.spark, dir)
      .agg(count(lit(1)).as("n"),
        min(col("o_orderkey")).as("first_key"),
        max(col("o_orderkey")).as("last_key"))
      .select(lit("LIVE").as("change"), col("n"), col("first_key"),
        col("last_key"))
    cdc.unionByName(live).orderBy(col("change"))
  }

  /** Predicate DELETE through the REAL table layer (r18, oracled —
    * Delta's `DELETE FROM t WHERE cond`, the statement every retention
    * policy runs): orders are committed range-partitioned, then
    * [[graft.sinks.SnapshotStore.deleteWhere]] removes rows by an
    * arbitrary multi-column predicate — one skinny scan finds the
    * touched files, only they are rewritten (disjoint files carried in
    * the O(delta) manifest). Output: live per-status totals + the
    * keyed CDC delete counts; the oracle replays the predicate as a
    * plain WHERE NOT. */
  def deleteWhereDemo(t: Tables): DataFrame = {
    import graft.sinks.SnapshotStore
    val dir = java.nio.file.Files
      .createTempDirectory("graft-delw").toString + "/t"
    val o = t.orders.select(col("o_orderkey"), col("o_orderstatus"),
      col("o_totalprice"))
    SnapshotStore.commit(
      o.repartitionByRange(8, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey"),
      dir, statsKey = Some("o_orderkey"))
    graft.GraftSql.delete(t.spark,
      s"DELETE FROM '$dir' WHERE o_totalprice > 150000 AND " +
        "o_orderstatus = 'O'")
    val live = SnapshotStore.read(t.spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_live"),
        min(col("o_orderkey")).as("first_live"),
        max(col("o_orderkey")).as("last_live"))
    val dels = SnapshotStore
      .readChanges(t.spark, dir, 1, 2, Some("o_orderkey"))
      .filter(col("_change") === "delete")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_deleted"))
    live.join(dels, Seq("o_orderstatus"), "full")
      .select(col("o_orderstatus"),
        coalesce(col("n_live"), lit(0L)).as("n_live"),
        col("first_live"), col("last_live"),
        coalesce(col("n_deleted"), lit(0L)).as("n_deleted"))
      .orderBy(col("o_orderstatus"))
  }

  /** Predicate UPDATE through the REAL table layer (r18, oracled —
    * Delta's `UPDATE t SET c = expr WHERE cond`): a conditional
    * repricing over the committed orders table — touched files
    * rewritten with the assignment applied to matching rows (cast back
    * to the column type), untouched files carried, CHECK-constraint
    * validation on the materialized result, keyed CDC classifying the
    * updates. The oracle replays the assignment as a CASE. */
  def updateWhereDemo(t: Tables): DataFrame = {
    import graft.sinks.SnapshotStore
    val dir = java.nio.file.Files
      .createTempDirectory("graft-updw").toString + "/t"
    val o = t.orders.select(col("o_orderkey"), col("o_orderstatus"),
      col("o_totalprice"))
    SnapshotStore.commit(
      o.repartitionByRange(8, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey"),
      dir, statsKey = Some("o_orderkey"))
    graft.GraftSql.update(t.spark,
      s"UPDATE '$dir' SET o_totalprice = o_totalprice * 2, " +
        "o_orderstatus = 'U' " +
        "WHERE o_orderstatus = 'F' AND o_orderkey % 7 = 0")
    val upd = SnapshotStore
      .readChanges(t.spark, dir, 1, 2, Some("o_orderkey"))
      .filter(col("_change") === "update")
      .agg(count(lit(1)).as("n_updated"),
        min(col("o_orderkey")).as("first_upd"),
        max(col("o_orderkey")).as("last_upd"))
    SnapshotStore.read(t.spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)"))
          .as("sum_cents"))
      .crossJoin(upd)
      .orderBy(col("o_orderstatus"))
  }

  /** INCREMENTAL VIEW MAINTENANCE driven through the REAL table layer
    * (r16, oracled): a per-status (count, exact-cents sum) aggregate
    * view of an orders table is maintained across THREE commits —
    * overwrite-with-updates, then a stats-pruned row DELETE — using
    * ONLY the CDC deltas ([[graft.sinks.SnapshotStore.readChanges]],
    * unkeyed): view ⊕= agg(inserts) ⊖ agg(deletes). Unkeyed CDC is the
    * right IVM feed for distributive aggregates: an update is
    * delete(old)+insert(new) and an identical rewrite cancels exactly
    * in the merge, so no keyed diff is needed. The base table is NEVER
    * re-aggregated after v1; the oracle replays the FULL recompute of
    * the final state, so the gate proves incremental ≡ recompute —
    * the IVM correctness contract.
    *
    * Scale: this is the nightly-refresh pattern at 100 TB — each
    * refresh costs O(changed files), not O(table): readChanges prunes
    * to the manifest set-difference, the delta aggregate is
    * map-side-combined and group-sized, and the view merge is a
    * broadcast-sized full-outer join on the group key. */
  def ivm(t: Tables): DataFrame = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ivm").toString + "/t"
    val cents = expr(
      "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents")
    val o = t.orders.select(col("o_orderkey"), col("o_orderstatus"),
      col("o_totalprice"))
    val v1 = o.filter(col("o_orderkey") % 10 =!= 0)
    val v2 = o.filter(col("o_orderkey") % 7 =!= 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice")).as("o_totalprice"))
    graft.sinks.SnapshotStore.commit(
      v1.repartitionByRange(4, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey"), dir,
      statsKey = Some("o_orderkey"))
    graft.sinks.SnapshotStore.commit(v2, dir)
    graft.sinks.SnapshotStore.deleteCommit(t.spark, dir,
      o.filter(col("o_orderkey") % 13 === 0).select(col("o_orderkey")),
      "o_orderkey")
    def aggOf(df: DataFrame, sign: Column): DataFrame =
      df.select(col("o_orderstatus"), cents, sign.as("s"))
        .groupBy(col("o_orderstatus"))
        .agg(sum(col("s")).as("dn"), sum(col("cents") * col("s")).as("dc"))
    // the view is INITIALIZED from v1 and then only ever merged with
    // CDC deltas — the base table is not touched again
    val view0 = aggOf(graft.sinks.SnapshotStore.read(t.spark, dir, Some(1)),
      lit(1L))
    def delta(fromV: Long, toV: Long): DataFrame =
      aggOf(graft.sinks.SnapshotStore.readChanges(t.spark, dir, fromV, toV),
        when(col("_change") === "insert", 1L).otherwise(-1L))
    Seq(delta(1, 2), delta(2, 3)).foldLeft(view0) { (v, d) =>
      v.withColumnRenamed("dn", "vn").withColumnRenamed("dc", "vc")
        .join(d, Seq("o_orderstatus"), "full")
        .select(col("o_orderstatus"),
          (coalesce(col("vn"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("dn"),
          (coalesce(col("vc"), lit(0L)) + coalesce(col("dc"), lit(0L))).as("dc"))
    }
      .filter(col("dn") > 0)
      .select(col("o_orderstatus"), col("dn").cast("long").as("n"),
        col("dc").cast("long").as("sum_cents"))
      .orderBy(col("o_orderstatus"))
  }

  /** Keep-first dedup by business key (the pipeline "latest record
    * wins" pattern, inverted to earliest): one row per (lang, source)
    * — a single window shuffle, no self-join. */
  def windowDedup(t: Tables): DataFrame = {
    val w = Window.partitionBy(col("lang"), col("source"))
      .orderBy(col("doc_id"))
    t.documents
      .select(col("lang"), col("source"), col("doc_id"), col("n_chars"),
        row_number().over(w).as("rn"))
      .filter(col("rn") === 1)
      .select(col("lang"), col("source"), col("doc_id"), col("n_chars"))
      .orderBy(col("lang"), col("source"))
  }
}
