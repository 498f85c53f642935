package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Core analytics operators (grouped agg, star joins, windows, rollup,
  * pivot, JSON extraction, distinct, percentiles).
  *
  * Cross-engine determinism: every SUM over a double column goes through
  * an exact DECIMAL cast so the result is independent of partial-agg
  * order (a double sum is not associative; at 32 partitions — let alone
  * 1000 executors — the combine order is nondeterministic). The exact
  * decimal sum is cast back to double at the end, which is a single
  * deterministic rounding both here and in the DuckDB oracle.
  */
object Analytics {

  // DECIMAL(9,2) for amounts, DECIMAL(4,2) for rates: products stay
  // well under Spark's precision-38 cap so no silent scale reduction.
  private val P = DecimalType(9, 2)
  private val R = DecimalType(4, 2)
  private def d(c: Column): Column = c.cast(P)
  private def one: Column = lit(1).cast(R)
  private def discF(c: Column): Column = one - c.cast(R)   // (5,2) exact
  private def taxF(c: Column): Column = one + c.cast(R)    // (5,2) exact
  /** Exact decimal sum of a 2-dp double, surfaced as double. */
  private def dsum(c: Column): Column = sum(d(c)).cast(DoubleType)

  /** TPC-H Q1: pricing summary report. One scan, one shuffle (partial
    * agg map-side), 4 groups out. */
  def q1Agg(t: Tables): DataFrame =
    t.lineitem
      .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(d(col("l_extendedprice")) * discF(col("l_discount")))
          .cast(DoubleType).as("sum_disc_price"),
        sum(d(col("l_extendedprice")) * discF(col("l_discount")) * taxF(col("l_tax")))
          .cast(DoubleType).as("sum_charge"),
        (sum(d(col("l_quantity"))).cast(DoubleType) / count(lit(1))).as("avg_qty"),
        (sum(d(col("l_extendedprice"))).cast(DoubleType) / count(lit(1))).as("avg_price"),
        (sum(d(col("l_discount"))).cast(DoubleType) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** TPC-H Q3 shape: customer ⨝ orders ⨝ lineitem, revenue top-10.
    * customer and date-filtered orders both grow linearly with SF
    * (orders is a FACT table — at the 100 TB target either side is
    * far past the broadcast cap), so neither join carries a hint:
    * both hash on their keys and AQE converts to broadcast only when
    * runtime sizes actually fit. Only the final groupBy must shuffle. */
  def q3Shipping(t: Tables): DataFrame = {
    val cutoff = lit("1998-01-01").cast("timestamp")
    val c = t.customer.filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val o = t.orders.filter(col("o_orderdate") < cutoff)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val l = t.lineitem.filter(col("l_shipdate") > cutoff)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    l.join(o.join(c, o("o_custkey") === c("c_custkey")),
        l("l_orderkey") === o("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(d(col("l_extendedprice")) * discF(col("l_discount")))
        .cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 shape: 6-table star join, revenue per nation in a region.
    * Only the schema-bounded dims (nation 25, region 5) are hinted;
    * customer/supplier are SF-linear so their joins are unhinted (AQE
    * broadcasts while they fit, sort-merge beyond the cap). lineitem
    * (the 100 TB table) is scanned once and shuffles only for its join
    * keys and the final 25-group agg. */
  def q5Local(t: Tables): DataFrame = {
    val o = t.orders
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("2002-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    t.lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(t.customer.select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(t.supplier.select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region.filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(d(col("l_extendedprice")) * discF(col("l_discount")))
        .cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Per-group top-k via window rank — the scalable "greatest N per
    * group" (no self-join, one shuffle on the partition key). */
  def topkGroup(t: Tables, k: Int = 5): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t.orders
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .orderBy(col("o_orderpriority"), col("rn"))
  }

  /** Running/offset/rank windows per customer (running sum is decimal-
    * exact so frame-evaluation strategy differences can't drift). */
  def windowRunning(t: Tables): DataFrame = {
    val byTime = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val byPrice = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t.orders.filter(col("o_custkey") < 100)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      .withColumn("running_spend",
        sum(d(col("o_totalprice")))
          .over(byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast(DoubleType))
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(byTime))
      .withColumn("price_rank", rank().over(byPrice).cast("long"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  /** ROLLUP over (priority, status): multi-level totals in one pass. */
  def rollupAgg(t: Tables): DataFrame =
    t.orders
      .rollup(col("o_orderpriority"), col("o_orderstatus"))
      .agg(dsum(col("o_totalprice")).as("sum_price"), count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority").asc_nulls_first, col("o_orderstatus").asc_nulls_first)

  private val EventTypes = Seq("click", "view", "purchase", "signup", "error")

  /** Pivot event counts to fixed columns (explicit value list so the
    * plan needs no extra pass to discover pivot values). */
  def pivotEvents(t: Tables): DataFrame = {
    val p = t.events.groupBy(col("user_id"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
    EventTypes.foldLeft(p) { (df, et) =>
      df.withColumnRenamed(et, s"n_$et")
    }.na.fill(0L, EventTypes.map(et => s"n_$et"))
      .orderBy(col("user_id"))
  }

  /** JSON prop extraction (get_json_object, codegen'd) + typed agg. */
  def jsonExtract(t: Tables): DataFrame =
    t.events
      .withColumn("k_val", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(sum(col("k_val")).as("k_sum"),
           max(col("k_val")).as("k_max"),
           count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  /** Exact distinct counts per group (count(distinct) → two-phase
    * partial-agg expansion in Spark; no driver collect). */
  def distinctUsers(t: Tables): DataFrame =
    t.events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"),
           count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))

  /** Exact interpolated percentiles per group (matches DuckDB
    * quantile_cont's linear interpolation). */
  def percentiles(t: Tables): DataFrame =
    t.events.groupBy(col("event_type"))
      .agg(
        expr("percentile(value, 0.25)").as("p25"),
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.75)").as("p75"))
      .orderBy(col("event_type"))

  /** Ratio-to-report: each event's share of its day's total value —
    * the window form of percent-of-total (no self-join against a
    * pre-aggregate). The denominator is an exact-decimal window sum
    * surfaced as double, so the single division is bit-stable.
    * Output sampled to every 100th event to stay bounded. */
  def ratioToReport(t: Tables): DataFrame = {
    val w = Window.partitionBy(to_date(col("ts")))
    t.events
      .withColumn("day_total", sum(d(col("value"))).over(w).cast(DoubleType))
      .filter(col("event_id") % 100 === 0)
      .select(col("event_id"), to_date(col("ts")).as("d"), col("value"),
        (col("value") / col("day_total")).as("share"))
      .orderBy(col("event_id"))
  }

  /** Two-level algebraic re-aggregation: daily partial states
    * (count / exact-decimal sum / min / max) merged into per-type
    * totals — the incremental-rollup pattern (materialize partials
    * once a day, merge on demand) and exactly the map-side-combine
    * contract made explicit. The partial SUM stays DECIMAL until the
    * final merge, so merged == direct bit-for-bit; avg is derived from
    * the merged moments, never averaged-of-averages. */
  def partialReagg(t: Tables): DataFrame = {
    val daily = t.events
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("_n"), sum(d(col("value"))).as("_s"),
        min(col("value")).as("_mn"), max(col("value")).as("_mx"))
    daily.groupBy(col("event_type"))
      .agg(sum(col("_n")).as("n_events"),
        sum(col("_s")).cast(DoubleType).as("total"),
        min(col("_mn")).as("mn"), max(col("_mx")).as("mx"),
        (sum(col("_s")).cast(DoubleType) / sum(col("_n"))).as("avg_value"),
        count(lit(1)).as("n_days"))
      .orderBy(col("event_type"))
  }
}
