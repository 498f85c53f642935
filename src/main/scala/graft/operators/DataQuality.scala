package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality AUDIT (the Deequ / Great Expectations
  * shape): a fixed constraint suite evaluated against live tables,
  * one report row per constraint — the gate a production pipeline
  * runs before promoting a batch. Constraint classes covered:
  *
  *   - scan-level (completeness, accepted values, non-negativity):
  *     ALL evaluated in ONE map-side aggregate pass over the table
  *     (Deequ's single-pass analyzer — n constraints never cost n
  *     scans), reshaped to rows with an inline explode.
  *   - uniqueness: one groupBy on the key, counting rows in
  *     key-groups of size > 1.
  *   - referential integrity: broadcast left-anti join against the
  *     dimension.
  *   - cross-table consistency: the fact↔dim equi-join with a
  *     row-level predicate (lineitem ships no earlier than its order
  *     is placed).
  *
  * Every metric is an exact BIGINT count, so the whole report is
  * DuckDB-replayable. Scale: 2 fact scans (scan-agg + join), one
  * key groupBy, one broadcast anti join — all map-side-combined;
  * the report itself is constraint-count-sized.
  */
object DataQuality {

  /** CHECK-semantics violation indicator: TRUE only when `sqlExpr`
    * evaluates FALSE — NULL passes (the SQL standard). The ONE
    * definition shared by table-constraint enforcement
    * ([[graft.sinks.SnapshotStore.addConstraint]]) and the streaming
    * monitor ([[graft.streaming.DqStream]]), so their verdicts can
    * never diverge. */
  def violatesCheck(sqlExpr: String): Column =
    not(coalesce(expr(sqlExpr), lit(true)))

  def dqAudit(t: Tables): DataFrame = {
    def cnt(c: Column): Column = sum(when(c, 1L).otherwise(0L))
    // —— one-pass scan-level analyzers over orders ——
    val scan = t.orders.agg(
        count(lit(1)).as("n"),
        cnt(col("o_orderstatus").isNull).as("v_null"),
        cnt(!col("o_orderstatus").isin("F", "O", "P")).as("v_vals"),
        cnt(col("o_totalprice") <= 0).as("v_price"))
      .select(explode(array(
        struct(lit("completeness:o_orderstatus").as("check_name"),
          col("n").as("n_checked"), col("v_null").as("n_violations")),
        struct(lit("accepted_values:o_orderstatus").as("check_name"),
          col("n").as("n_checked"), col("v_vals").as("n_violations")),
        struct(lit("positive:o_totalprice").as("check_name"),
          col("n").as("n_checked"), col("v_price").as("n_violations"))))
        .as("c"))
      .select(col("c.*"))
    // —— uniqueness of the business key ——
    val uniq = t.orders.groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("c"))
      .agg(sum(col("c")).as("n_checked"),
        sum(when(col("c") > 1, col("c")).otherwise(0L)).as("n_violations"))
      .select(lit("uniqueness:o_orderkey").as("check_name"),
        col("n_checked"), col("n_violations"))
    // —— referential integrity: every order has a customer ——
    val refChecked = t.orders.select(count(lit(1)).as("n_checked"))
    val orphans = t.orders.join(
        broadcast(t.customer.select(col("c_custkey").as("o_custkey"))),
        Seq("o_custkey"), "left_anti")
      .select(count(lit(1)).as("n_violations"))
    val ref = refChecked.crossJoin(orphans)
      .select(lit("ref_integrity:orders.o_custkey").as("check_name"),
        col("n_checked"), col("n_violations"))
    // —— cross-table consistency: ship date ≥ order date ——
    val ship = t.lineitem
      .select(col("l_orderkey").as("o_orderkey"), col("l_shipdate"))
      .join(t.orders.select(col("o_orderkey"), col("o_orderdate")),
        Seq("o_orderkey"))
      .agg(count(lit(1)).as("n_checked"),
        cnt(col("l_shipdate") < col("o_orderdate")).as("n_violations"))
      .select(lit("consistency:l_shipdate>=o_orderdate").as("check_name"),
        col("n_checked"), col("n_violations"))
    scan.unionByName(uniq).unionByName(ref).unionByName(ship)
      .select(col("check_name"),
        col("n_checked").cast("long").as("n_checked"),
        col("n_violations").cast("long").as("n_violations"),
        when(col("n_violations") === 0, "PASS").otherwise("FAIL")
          .as("verdict"))
      .orderBy(col("check_name"))
  }
}
